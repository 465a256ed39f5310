#!/usr/bin/env python3
"""Generate the deterministic ETL mini-dump checked in at data/etl_minidump.jsonl.

The file mimics the Wikidata dump framing the reference consumes
(reference: src/main.rs:174-215): a `[` line, one JSON entity per line with a
trailing comma, a `]` line — plus deliberately malformed lines that a tolerant
reader must skip. It is the shared input for the driver-visible ETL gate:
graft.wikidata.EtlGates runs the Spark ETL over it, and the paired DuckDB
oracle SQL re-derives each output table from the same file with JSON
functions. Regenerate with `python3 tools/gen_minidump.py` (seeded — output
is byte-stable).

Coverage by construction: Q/P/L entities; labels/descriptions present and
absent; string + monolingualtext claims (incl. a text-less monolingual that
must route to `none`); entity refs incl. lexeme form/sense ids and one
malformed id; globe coordinates with/without precision; quantities with
bounds, dimensionless unit "1", unit URIs, and one malformed amount; times
with zero month/day at coarse precision; novalue/somevalue snaks; deprecated
ranks (must be dropped); junk lines (must be skipped).
"""
import json
import random

OUT = "data/etl_minidump.jsonl"
rng = random.Random(20260812)
# Qualifier planting draws from an INDEPENDENT stream: the main rng's draw
# sequence (and therefore every previously-planted entity/claim byte) is
# untouched, so the w22 changeset/v2 fixtures generated against the original
# dump stay consistent — qualifiers are a pure superset of the old file.
qrng = random.Random(20260815)
# rank-contest planting (W46) — its own stream, same isolation argument
rrng = random.Random(20260816)
# typed + span rank contests (W47/W48) — its own stream again
trng = random.Random(20260817)
# sitelinks + aliases (W51/W52) — its own stream again
srng = random.Random(20260819)
# statement references (W59) — its own stream again
frng = random.Random(20260821)

WORDS = ["alpha", "beta", "gamma", "delta", "rho", "sigma", "omega", "kappa"]


def word():
    return rng.choice(WORDS) + str(rng.randint(0, 99))


def statement(snak, rank):
    return {"mainsnak": snak, "type": "statement", "rank": rank}


def qword():
    return qrng.choice(WORDS) + str(qrng.randint(0, 99))


def qual_snak(qpid, r=None):
    """One qualifier snak (same shape as a mainsnak, property key lives on the
    enclosing map). Mix of every value family the 7-way router handles, plus
    novalue/somevalue and the none-routed text-less monolingual. `r` picks
    the stream (default: the qualifier stream; W59 references pass frng)."""
    r = qrng if r is None else r
    k = r.randrange(12)
    if k <= 2:  # time — the P580/P582 temporal-validity workhorse
        year = r.randint(1900, 1999)
        month = 0 if r.random() < 0.3 else r.randint(1, 12)
        day = 0 if month == 0 or r.random() < 0.3 else r.randint(1, 28)
        return {"snaktype": "value", "property": f"P{qpid}",
                "datavalue": {"value": {"time": f"+{year:04d}-{month:02d}-{day:02d}T00:00:00Z",
                                        "timezone": 0, "precision": r.randint(9, 11)},
                              "type": "time"}}
    if k <= 4:  # plain string
        return {"snaktype": "value", "property": f"P{qpid}",
                "datavalue": {"value": (r.choice(WORDS) + str(r.randint(0, 99))), "type": "string"}}
    if k == 5:  # monolingual with text
        return {"snaktype": "value", "property": f"P{qpid}",
                "datavalue": {"value": {"text": (r.choice(WORDS) + str(r.randint(0, 99))), "language": "en"},
                              "type": "monolingualtext"}}
    if k == 6:  # monolingual WITHOUT text -> none kind
        return {"snaktype": "value", "property": f"P{qpid}",
                "datavalue": {"value": {"language": "en"}, "type": "monolingualtext"}}
    if k == 7:  # entity ref (rarely malformed -> row dropped, like the main table)
        target = f"Q{r.randint(1, 99999)}" if r.random() < 0.9 else "Qbroken"
        return {"snaktype": "value", "property": f"P{qpid}",
                "datavalue": {"value": {"entity-type": "item", "id": target},
                              "type": "wikibase-entityid"}}
    if k == 8:  # quantity (sometimes malformed amount, sometimes bounds)
        amt = round(r.uniform(-50, 500), 2)
        value = {"amount": "+not-a-number" if r.random() < 0.1
                 else (f"+{amt}" if amt >= 0 else str(amt))}
        value["unit"] = "1" if r.random() < 0.5 \
            else f"http://www.wikidata.org/entity/Q{r.randint(1, 999)}"
        if r.random() < 0.3:
            value["lowerBound"] = f"+{round(amt - 1, 2)}"
            value["upperBound"] = f"+{round(amt + 1, 2)}"
        return {"snaktype": "value", "property": f"P{qpid}",
                "datavalue": {"value": value, "type": "quantity"}}
    if k == 9:  # coordinates
        value = {"latitude": round(r.uniform(-90, 90) * 2) / 2.0,
                 "longitude": round(r.uniform(-180, 180) * 2) / 2.0,
                 "globe": "http://www.wikidata.org/entity/Q2"}
        if r.random() < 0.7:
            value["precision"] = r.choice([0.1, 0.01, 1.0])
        return {"snaktype": "value", "property": f"P{qpid}",
                "datavalue": {"value": value, "type": "globecoordinate"}}
    if k == 10:
        return {"snaktype": "novalue", "property": f"P{qpid}"}
    return {"snaktype": "somevalue", "property": f"P{qpid}"}


def add_rank_contests(ent):
    """Plant multi-statement entity-claim GROUPS with contested ranks on
    ~25% of entity-valued claims: a second statement under the SAME
    property with a different target and a random rank. The W46 truthy
    cut only bites when preferred and normal coexist in one (entity,
    property) group — without this the law is untestable on the dump."""
    for pid_text, stmts in list(ent["claims"].items()):
        for st in list(stmts):
            ms = st.get("mainsnak", {})
            if (ms.get("snaktype") == "value"
                    and ms.get("datavalue", {}).get("type") == "wikibase-entityid"
                    and rrng.random() < 0.5):
                tgt = f"Q{rrng.randint(1, 99999)}"
                snak = {"snaktype": "value", "property": pid_text,
                        "datavalue": {"value": {"entity-type": "item", "id": tgt},
                                      "type": "wikibase-entityid"}}
                stmts.append({"mainsnak": snak, "type": "statement",
                              "rank": rrng.choice(["preferred", "preferred", "normal", "deprecated"])})


def _t_quantity_snak(pid_text):
    amt = round(trng.uniform(0, 9999), 2)
    value = {"amount": f"+{amt}",
             "unit": "1" if trng.random() < 0.5
             else f"http://www.wikidata.org/entity/Q{trng.randint(1, 999)}"}
    return {"snaktype": "value", "property": pid_text,
            "datavalue": {"value": value, "type": "quantity"}}


def _t_time_snak(pid_text):
    year = trng.randint(1900, 1999)
    return {"snaktype": "value", "property": pid_text,
            "datavalue": {"value": {"time": f"+{year:04d}-01-01T00:00:00Z",
                                    "timezone": 0, "precision": 9},
                          "type": "time"}}


def _t_string_snak(pid_text):
    return {"snaktype": "value", "property": pid_text,
            "datavalue": {"value": trng.choice(WORDS) + str(trng.randint(0, 99)),
                          "type": "string"}}


def _t_entity_snak(pid_text):
    return {"snaktype": "value", "property": pid_text,
            "datavalue": {"value": {"entity-type": "item",
                                    "id": f"Q{trng.randint(1, 99999)}"},
                          "type": "wikibase-entityid"}}


def add_typed_contests(ent):
    """W47/W48 fixtures, three families of contested statement groups:

    1. SAME-FAMILY contests on quantity/time/string claims — a second
       statement of the same value type under the same property with a
       random rank (incl. preferred), so the typed truthy cut over the
       quantity and time tables actually removes rows ("the population of
       X" returns only the preferred figure).
    2. MIXED-TYPE contests — a preferred statement of a DIFFERENT value
       family planted into the group (a preferred quantity next to normal
       entity statements, a preferred NOVALUE next to valued ones): the
       BestRank flag must aggregate over ALL statements of the group, not
       within one value family — a flag computed per-slice diverges here.
    3. RANK+SPAN contests (W48) — a preferred ENTITY statement carrying
       its own P580/P582 validity span (sometimes dead at the 1950 gate
       timestamp, sometimes alive) alongside the normals: truthy keeps
       only the preferred one, validAt then decides whether the group
       answers at all — the composition is only testable when both cuts
       bite the same group.
    """
    for pid_text, stmts in list(ent["claims"].items()):
        for st in list(stmts):
            ms = st.get("mainsnak", {})
            if ms.get("snaktype") != "value":
                continue
            vt = ms.get("datavalue", {}).get("type")
            r = trng.random()
            if vt in ("quantity", "time", "string") and r < 0.5:
                snak = {"quantity": _t_quantity_snak, "time": _t_time_snak,
                        "string": _t_string_snak}[vt](pid_text)
                stmts.append({"mainsnak": snak, "type": "statement",
                              "rank": trng.choice(["preferred", "preferred",
                                                   "normal", "deprecated"])})
            elif r < 0.12:
                maker = trng.choice([_t_quantity_snak, _t_time_snak,
                                     _t_string_snak, _t_entity_snak])
                stmts.append({"mainsnak": maker(pid_text), "type": "statement",
                              "rank": "preferred"})
            elif r < 0.16:
                stmts.append({"mainsnak": {"snaktype": "novalue",
                                           "property": pid_text},
                              "type": "statement", "rank": "preferred"})
            if vt == "wikibase-entityid" and trng.random() < 0.2:
                span_kind = trng.randrange(3)
                if span_kind == 0:   # ended before 1950: dead at the gate T
                    quals = {"P582": [_t_span_time("P582", trng.randint(1900, 1949))]}
                elif span_kind == 1:  # starts after 1950: not yet at T
                    quals = {"P580": [_t_span_time("P580", trng.randint(1951, 1999))]}
                else:                 # alive at T
                    quals = {"P580": [_t_span_time("P580", trng.randint(1900, 1949))],
                             "P582": [_t_span_time("P582", trng.randint(1951, 1999))]}
                stmts.append({"mainsnak": _t_entity_snak(pid_text),
                              "type": "statement", "rank": "preferred",
                              "qualifiers": quals,
                              "qualifiers-order": list(quals.keys())})


def _t_span_time(qpid_text, year):
    return {"snaktype": "value", "property": qpid_text,
            "datavalue": {"value": {"time": f"+{year:04d}-06-15T00:00:00Z",
                                    "timezone": 0, "precision": 11},
                          "type": "time"}}


def add_links(ent):
    """W51/W52 fixtures: sitelinks (several wikis, some entities none) and
    multilingual alias lists (1-3 per language, some languages absent) —
    the name-and-link surface the reference drops."""
    if srng.random() < 0.6:
        sl = {}
        for site in ("enwiki", "dewiki", "frwiki", "commonswiki"):
            if srng.random() < 0.4:
                title = (srng.choice(WORDS) + " " + str(srng.randint(0, 999))).title()
                sl[site] = {"site": site, "title": title}
        if sl:
            ent["sitelinks"] = sl
    if srng.random() < 0.5:
        al = {}
        for lang in ("en", "de", "fr"):
            if srng.random() < 0.5:
                al[lang] = [{"language": lang,
                             "value": srng.choice(WORDS) + str(srng.randint(0, 99))}
                            for _ in range(1 + srng.randrange(3))]
        if al:
            ent["aliases"] = al


def add_qualifiers(ent, id_text):
    """Plant statement ids + qualifiers on ~40% of statements (deprecated
    statements included — the router must drop their qualifiers too)."""
    sidx = 0
    for pid_text, stmts in ent["claims"].items():
        for st in stmts:
            st["id"] = f"{id_text}${sidx}"
            sidx += 1
            if "qualifiers" in st:  # span-contest statements keep theirs
                continue
            if qrng.random() < 0.4:
                quals = {}
                for _ in range(qrng.randint(1, 3)):
                    # bias toward P580/P582 so temporal validity has real data
                    r = qrng.random()
                    qpid = 580 if r < 0.25 else (582 if r < 0.45 else qrng.randint(1, 9999))
                    snak = qual_snak(qpid)
                    if qpid in (580, 582):  # start/end time must BE times
                        while snak.get("datavalue", {}).get("type") != "time":
                            snak = qual_snak(qpid)
                    quals.setdefault(f"P{qpid}", []).append(snak)
                st["qualifiers"] = quals
                st["qualifiers-order"] = list(quals.keys())


def add_references(ent):
    """W59 fixtures: reference records on ~30% of statements (deprecated
    statements included — the router must drop their references too): 1-2
    records per statement, 1-2 snaks each, every value family via qual_snak
    on the independent frng stream (v1 entity bytes for the pre-W59 fields
    are untouched — references are a pure superset of the old file)."""
    for pid_text, stmts in ent["claims"].items():
        for st in stmts:
            if frng.random() < 0.3:
                refs = []
                for _ in range(1 + (1 if frng.random() < 0.3 else 0)):
                    snaks = {}
                    for _ in range(1 + (1 if frng.random() < 0.4 else 0)):
                        rpid = 248 if frng.random() < 0.3 else frng.randint(1, 9999)
                        snaks.setdefault(f"P{rpid}", []).append(qual_snak(rpid, frng))
                    refs.append({"snaks": snaks, "snaks-order": list(snaks.keys())})
                st["references"] = refs


def gen_entity(i):
    kind = rng.randrange(3)
    n = i + 1
    id_text = ("Q", "P", "L")[kind] + str(n)
    ent = {"id": id_text, "type": "item", "labels": {}, "descriptions": {}, "claims": {}}
    if rng.random() < 0.7:
        ent["labels"]["en"] = {"language": "en", "value": word()}
    if rng.random() < 0.5:
        ent["descriptions"]["en"] = {"language": "en", "value": word() + " " + word()}
    # a sprinkle of non-English labels the ETL must ignore
    if rng.random() < 0.3:
        ent["labels"]["de"] = {"language": "de", "value": word()}

    for _ in range(rng.randrange(5)):
        pid = rng.randint(1, 9999)
        rank = rng.choice(["normal", "normal", "preferred", "deprecated"])
        kind = rng.randrange(10)
        if kind == 0:  # plain string
            snak = {"snaktype": "value", "property": f"P{pid}",
                    "datavalue": {"value": word() + " " + word(), "type": "string"}}
        elif kind == 1:  # monolingual text
            snak = {"snaktype": "value", "property": f"P{pid}",
                    "datavalue": {"value": {"text": word(), "language": "en"},
                                  "type": "monolingualtext"}}
        elif kind == 2:  # monolingual with no text -> none table
            snak = {"snaktype": "value", "property": f"P{pid}",
                    "datavalue": {"value": {"language": "en"}, "type": "monolingualtext"}}
        elif kind == 3:  # entity ref (sometimes a form/sense id, rarely malformed)
            r = rng.random()
            if r < 0.6:
                target = f"Q{rng.randint(1, 99999)}"
            elif r < 0.75:
                target = f"L{rng.randint(1, 999)}-F{rng.randint(1, 9)}"
            elif r < 0.9:
                target = f"L{rng.randint(1, 999)}-S{rng.randint(1, 9)}"
            else:
                target = "Qbroken"  # encode -> NULL -> dropped
            snak = {"snaktype": "value", "property": f"P{pid}",
                    "datavalue": {"value": {"entity-type": "item", "id": target},
                                  "type": "wikibase-entityid"}}
        elif kind == 4:  # coordinates
            lat = round(rng.uniform(-90, 90) * 2) / 2.0
            lon = round(rng.uniform(-180, 180) * 2) / 2.0
            value = {"latitude": lat, "longitude": lon,
                     "globe": "http://www.wikidata.org/entity/Q2"}
            if rng.random() < 0.8:
                value["precision"] = rng.choice([0.1, 0.01, 1.0])
            snak = {"snaktype": "value", "property": f"P{pid}",
                    "datavalue": {"value": value, "type": "globecoordinate"}}
        elif kind == 5:  # quantity
            amt = round(rng.uniform(-100, 10000), 2)
            value = {"amount": f"+{amt}" if amt >= 0 else str(amt)}
            if rng.random() < 0.1:
                value["amount"] = "+not-a-number"  # try_cast -> NULL amount
            if rng.random() < 0.5:
                value["unit"] = "1"
            else:
                value["unit"] = f"http://www.wikidata.org/entity/Q{rng.randint(1, 999)}"
            if rng.random() < 0.3:
                value["lowerBound"] = f"+{round(amt - 1, 2)}"
                value["upperBound"] = f"+{round(amt + 1, 2)}"
            snak = {"snaktype": "value", "property": f"P{pid}",
                    "datavalue": {"value": value, "type": "quantity"}}
        elif kind == 6:  # time (zero month/day at coarse precision)
            # years kept >= 1900: pyarrow coerces INT96 parquet timestamps to
            # nanoseconds, whose range starts at 1677 — an earlier year would
            # overflow in any ns-based reader (driver comparator included)
            year = rng.randint(1900, 1999)
            month = 0 if rng.random() < 0.5 else rng.randint(1, 12)
            day = 0 if month == 0 or rng.random() < 0.5 else rng.randint(1, 28)
            prec = rng.randint(9, 11)
            value = {"time": f"+{year:04d}-{month:02d}-{day:02d}T00:00:00Z",
                     "timezone": 0, "precision": prec}
            snak = {"snaktype": "value", "property": f"P{pid}",
                    "datavalue": {"value": value, "type": "time"}}
        elif kind == 7:
            snak = {"snaktype": "novalue", "property": f"P{pid}"}
        else:
            snak = {"snaktype": "somevalue", "property": f"P{pid}"}
        ent["claims"].setdefault(f"P{pid}", []).append(statement(snak, rank))
    return ent


def main():
    lines = ["["]
    for i in range(300):
        ent = gen_entity(i)
        add_rank_contests(ent)
        add_typed_contests(ent)
        add_links(ent)
        add_qualifiers(ent, ent["id"])
        add_references(ent)
        lines.append(json.dumps(ent, separators=(",", ":")) + ",")
        if i % 60 == 17:
            lines.append("this is not json,")  # tolerant reader must skip
        if i % 60 == 43:
            lines.append("")  # blank line must be skipped
    lines.append("]")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}: {len(lines)} lines")


if __name__ == "__main__":
    main()
