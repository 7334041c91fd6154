#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's
Spark parquet dumps against DuckDB running SparkEntry.oracleSql — plus
independent pure-Python oracles for two queries DuckDB cannot express
(q25 simhash, q43 winnowing; VERDICT r04 #7): both are deterministic
functions of their input, so a from-scratch reimplementation in another
language (including its own XXH64) is the next-best hard signal after a
SQL oracle.

Usage: python3 tools/parity_check.py <sfDir> <verifyOutDir>
(dev tool only — the Scala library has no python dependency)
"""
import sys, os, json, math, re
import duckdb
import pandas as pd

# ---------------------------------------------------------------- xxh64
# Pure-python XXH64 (public spec, xxhash.com) — written independently of
# Spark's Java implementation; Spark's xxhash64() is XXH64 over the
# UTF-8 bytes with seed 42, returned as a SIGNED 64-bit long.
_P1, _P2, _P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_P4, _P5, _M = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5, (1 << 64) - 1

def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M

def _round(acc, inp):
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M

def _merge(acc, val):
    return ((acc ^ _round(0, val)) * _P1 + _P4) & _M

def xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M
        v3, v4 = seed & _M, (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h

def _signed(u):
    return u - (1 << 64) if u >= (1 << 63) else u

def xxh64s(s: str) -> int:
    return _signed(xxh64(s.encode("utf-8")))

# ------------------------------------------- python oracles (q25 / q43)

def _read_docs(sf_dir):
    return pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))

def _corpus_with_near_dups(sf_dir, drop_words):
    """TrainingData.corpusWithNearDups: base docs plus, for doc_id%7==0,
    a mutated twin (doc_id+100000) with the first drop_words words cut."""
    out = []
    for r in _read_docs(sf_dir).itertuples():
        out.append((r.doc_id, r.text))
        if r.doc_id % 7 == 0:
            out.append((r.doc_id + 100000,
                        re.sub(r"^(?:\S+\s+){%d}" % drop_words, "", r.text, count=1)))
    return out

def expected_q25(sf_dir) -> pd.DataFrame:
    """SimHash(64) per-token-majority + 8x8-bit band blocking, hamming<=8
    (mirrors TrainingData.q25Simhash; java split(-1) keeps leading and
    trailing empty tokens, as does re.split)."""
    sigs = {}
    for doc_id, text in _corpus_with_near_dups(sf_dir, drop_words=1):
        tokens = list(dict.fromkeys(re.split(r"\s+", text.lower())))
        hashes = [xxh64s(t) for t in tokens]
        acc = 0
        for i in range(64):
            vote = sum(1 if (h >> (63 - i)) & 1 else -1 for h in hashes)
            acc = ((acc << 1) | (1 if vote >= 0 else 0)) & _M
        sigs[doc_id] = _signed(acc)
    buckets = {}
    for doc_id, sh in sigs.items():
        for b in range(8):
            buckets.setdefault((b, (sh >> (b * 8)) & 255), []).append(doc_id)
    pairs = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if a != b and (a, b) not in pairs:
                    ham = bin((sigs[a] ^ sigs[b]) & _M).count("1")
                    pairs[(a, b)] = ham
    rows = [(a, b, h) for (a, b), h in sorted(pairs.items()) if h <= 8]
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

def expected_q43(sf_dir) -> pd.DataFrame:
    """Winnowing fingerprints, k=8 char-grams, w=16 windows (mirrors
    TrainingData.q43WinnowFingerprints: per-window min gram hash,
    order-preserving distinct, position-exploded)."""
    k, w = 8, 16
    rows = []
    for r in _read_docs(sf_dir).itertuples():
        nrm = re.sub(r"\s+", " ", r.text.lower())
        grams = [xxh64s(nrm[i:i + k]) for i in range(max(len(nrm) - k, 0) + 1)]
        minima = [min(grams[i:i + w]) for i in range(max(len(grams) - w, 0) + 1)]
        fps = list(dict.fromkeys(minima))
        for pos, fp in enumerate(fps):
            rows.append((r.doc_id, len(fps), pos, fp))
    return pd.DataFrame(rows,
                        columns=["doc_id", "n_fingerprints", "pos", "fingerprint"])

PY_ORACLES = {
    "q25_simhash": expected_q25,
    "q43_winnow_fingerprints": expected_q43,
}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def compare(name, got, exp):
    """Compare canonicalized spark output vs oracle frame. Returns True ok."""
    got, exp = canon(got), canon(exp)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(exp.columns)}")
        return False
    if len(got) != len(exp):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
        return False
    mism = 0
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (x, y) in enumerate(zip(gv, ev)):
            if not values_equal(x, y):
                if mism < 3:
                    print(f"  {name}.{c}[{i}]: spark={x!r} oracle={y!r}")
                mism += 1
    if mism:
        print(f"FAIL {name}: {mism} value mismatches")
        return False
    print(f"ok   {name} ({len(got)} rows)")
    return True

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            ok = compare(name, pd.read_parquet(spark_path), con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); ok = False
        n_ok, n_bad = n_ok + ok, n_bad + (not ok)
    # non-SQL queries with an independent PYTHON oracle (q25/q43)
    for name, fn in sorted(PY_ORACLES.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            continue  # Verify didn't dump it (e.g. partial run)
        try:
            ok = compare(name + " (py)", pd.read_parquet(spark_path), fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name} (py): {e}"); ok = False
        n_ok, n_bad = n_ok + ok, n_bad + (not ok)
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
