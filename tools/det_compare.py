#!/usr/bin/env python3
"""Determinism A/B (dev tool): compare two graft.Verify dump dirs
(e.g. local[4] vs local[32]) value-exactly, columns sorted by name,
rows sorted by stringified key — the DETERMINISM_r{N}.json protocol.

Usage: python3 tools/det_compare.py /tmp/det_p4 /tmp/det_p32
"""
import sys, os, json
import pandas as pd
import pyarrow.dataset as ds


def load(d):
    return ds.dataset(d, format="parquet").to_table().to_pandas()


def rowkeys(df):
    if not len(df):
        return pd.Series([], dtype=str)
    s = df.iloc[:, 0].astype(str)
    for c in df.columns[1:]:
        s = s + "|" + df[c].astype(str)
    return s.sort_values().reset_index(drop=True)


def main(a, b):
    # symmetric surface: a dump missing from EITHER side is a difference,
    # not a silently shrunken surface
    names = sorted({n for d in (a, b) for n in os.listdir(d)
                    if os.path.isdir(os.path.join(d, n))})
    differing, identical = [], 0
    for n in names:
        if not os.path.isdir(os.path.join(a, n)):
            differing.append(n + " (missing in A)")
            continue
        if not os.path.isdir(os.path.join(b, n)):
            differing.append(n + " (missing in B)")
            continue
        da, db = load(os.path.join(a, n)), load(os.path.join(b, n))
        da, db = da[sorted(da.columns)], db[sorted(db.columns)]
        if list(da.columns) != list(db.columns) or len(da) != len(db) \
           or not rowkeys(da).equals(rowkeys(db)):
            differing.append(n)
        else:
            identical += 1
    print(json.dumps({"surface": len(names), "identical": identical,
                      "differing": differing}, indent=1))
    return 1 if differing else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
