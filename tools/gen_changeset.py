#!/usr/bin/env python3
"""Generate the incremental-ETL fixtures for the W22 gate:

  data/etl_changeset.jsonl   — an entity-revision changeset against
                               data/etl_minidump.jsonl (v1): full entity
                               documents carrying `lastrevid`, plus deletion
                               markers {"id":..,"lastrevid":..,"deleted":true},
                               in the same dump framing (brackets, trailing
                               commas, junk/blank lines a tolerant reader
                               must skip).
  data/etl_minidump_v2.jsonl — the full dump equivalent to v1 + changeset:
                               what a from-scratch rebuild would consume.

The W22 contract is last-writer-wins by `lastrevid` (the Wikidata revision
counter): the changeset deliberately carries multiple revisions of the same
entity OUT OF FILE ORDER (a stale revision can appear after the winner), so
an apply that keys on file position instead of revision id diverges from the
oracle. Planted cases: modify; modify with a stale extra revision; delete;
delete with a stale put after it; delete-then-recreate (put outranks the
delete); delete of an id v1 never had (no-op); brand-new entities.

Deterministic (seeded); regenerate with `python3 tools/gen_changeset.py`
after regenerating v1. The paired DuckDB oracle rebuilds each table from the
v2 file, so Spark's incremental apply of (v1, changeset) must match it
hash-exactly.
"""
import json
import random

import gen_minidump as g

CHANGESET = "data/etl_changeset.jsonl"
V2 = "data/etl_minidump_v2.jsonl"


def main():
    # replay v1 exactly (same seed + call sequence as gen_minidump.main),
    # INCLUDING its qualifier stream — v2 must carry v1's untouched
    # entities byte-for-byte, qualifiers and statement ids included (W40)
    g.rng = random.Random(20260812)
    g.qrng = random.Random(20260815)
    g.rrng = random.Random(20260816)
    g.trng = random.Random(20260817)
    g.srng = random.Random(20260819)
    g.frng = random.Random(20260821)
    v1 = []
    for i in range(300):
        ent = g.gen_entity(i)
        g.add_rank_contests(ent)
        g.add_typed_contests(ent)
        g.add_links(ent)
        g.add_qualifiers(ent, ent["id"])
        g.add_references(ent)
        v1.append(ent)

    rng = random.Random(20260813)   # choreography: which ids, which cases
    g.rng = random.Random(77)       # fresh content stream for new revisions
    g.qrng = random.Random(88)      # fresh qualifier stream for revisions
    g.rrng = random.Random(89)      # fresh rank-contest stream for revisions
    g.trng = random.Random(90)      # fresh typed-contest stream for revisions
    g.srng = random.Random(91)      # fresh links stream for revisions
    g.frng = random.Random(92)      # fresh references stream for revisions

    idx = list(range(300))
    rng.shuffle(idx)
    modified = idx[:30]            # plain modify
    modified_stale = idx[30:40]    # modify + a stale lower-revid revision
    deleted = idx[40:50]           # plain delete
    deleted_stale = idx[50:55]     # delete + a stale put after it
    recreated = idx[55:58]         # delete, then a put that outranks it

    def revise(i):
        """Fresh entity content under the v1 entity's id."""
        ent = g.gen_entity(i)
        ent["id"] = v1[i]["id"]
        g.add_rank_contests(ent)
        g.add_typed_contests(ent)
        g.add_links(ent)
        g.add_qualifiers(ent, ent["id"])
        g.add_references(ent)
        return ent

    revid = 1000
    def next_revid():
        nonlocal revid
        revid += rng.randint(1, 7)
        return revid

    lines = []          # (sort_key, json_obj) — shuffled at the end
    winners = {}        # id_text -> entity dict (None = deleted)

    def put(ent, rv):
        ent = dict(ent)
        ent["lastrevid"] = rv
        lines.append(ent)
        return ent

    def tombstone(id_text, rv):
        lines.append({"id": id_text, "lastrevid": rv, "deleted": True})

    for i in modified:
        winners[v1[i]["id"]] = put(revise(i), next_revid())
    for i in modified_stale:
        stale_rv = next_revid()
        win_rv = next_revid()
        winners[v1[i]["id"]] = put(revise(i), win_rv)
        put(revise(i), stale_rv)       # stale content AFTER the winner in file
    for i in deleted:
        tombstone(v1[i]["id"], next_revid())
        winners[v1[i]["id"]] = None
    for i in deleted_stale:
        stale_rv = next_revid()
        win_rv = next_revid()
        tombstone(v1[i]["id"], win_rv)
        put(revise(i), stale_rv)       # stale put after the winning delete
        winners[v1[i]["id"]] = None
    for i in recreated:
        del_rv = next_revid()
        win_rv = next_revid()
        tombstone(v1[i]["id"], del_rv)
        winners[v1[i]["id"]] = put(revise(i), win_rv)
    # deletes of ids v1 never had: must be a no-op (and not resurrect rows)
    for n in (9001, 9002):
        tombstone(f"Q{n}", next_revid())
    # brand-new entities (ids beyond the v1 range)
    for i in range(300, 312):
        ent = g.gen_entity(i)
        g.add_rank_contests(ent)
        g.add_typed_contests(ent)
        g.add_links(ent)
        g.add_qualifiers(ent, ent["id"])
        winners[ent["id"]] = put(ent, next_revid())

    rng.shuffle(lines)

    out = ["["]
    for k, obj in enumerate(lines):
        out.append(json.dumps(obj, separators=(",", ":")) + ",")
        if k % 25 == 7:
            out.append("not json at all,")
        if k % 25 == 19:
            out.append("")
    out.append("]")
    with open(CHANGESET, "w") as f:
        f.write("\n".join(out) + "\n")

    # v2 = v1 with winners applied in place, new entities appended
    v2 = []
    for ent in v1:
        if ent["id"] in winners:
            w = winners[ent["id"]]
            if w is not None:
                v2.append(w)
        else:
            v2.append(ent)
    v1_ids = {e["id"] for e in v1}
    for id_text, w in winners.items():
        if w is not None and id_text not in v1_ids:
            v2.append(w)

    out = ["["]
    for ent in v2:
        out.append(json.dumps(ent, separators=(",", ":")) + ",")
    out.append("]")
    with open(V2, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {CHANGESET}: {len(lines)} changes; {V2}: {len(v2)} entities")


if __name__ == "__main__":
    main()
