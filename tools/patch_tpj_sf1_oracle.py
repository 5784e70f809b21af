#!/usr/bin/env python3
"""sf1-only oracle patch: rewrite time_pair_join's direct BETWEEN
self-join to the bucket-decomposed statement of the SAME predicate
(cell equi-join + exact filter). DuckDB's IEJoin needs >3h CPU on the
direct form at 1M x 1M events; the decomposition is row-identical:
b's cell is fixed, a explodes to {c-1, c, c+1}, and a qualifying pair
matches in exactly one exploded cell. Verified equivalent at sf0.01
against the unpatched form before use (r16 protocol)."""
import json, sys

path = sys.argv[1]
d = json.load(open(path))
sql = d["time_pair_join"]
old = ("FROM ev a JOIN ev b\n"
       "  ON b.ts_ms BETWEEN a.ts_ms - 120000 AND a.ts_ms + 120000\n"
       " AND a.user_id < b.user_id")
new = ("FROM (SELECT user_id, ts_ms, ts_ms // 120000 + t.d AS c\n"
       "      FROM ev, (VALUES (-1), (0), (1)) t(d)) a\n"
       "JOIN (SELECT user_id, ts_ms, ts_ms // 120000 AS c FROM ev) b\n"
       "  ON a.c = b.c\n"
       " AND b.ts_ms BETWEEN a.ts_ms - 120000 AND a.ts_ms + 120000\n"
       " AND a.user_id < b.user_id")
assert old in sql, "time_pair_join oracle shape changed; update the patch"
d["time_pair_join"] = sql.replace(old, new)
json.dump(d, open(path, "w"))
print("patched time_pair_join oracle (bucket-decomposed)")
