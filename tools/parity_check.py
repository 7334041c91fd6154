#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's
Spark parquet dumps against DuckDB running SparkEntry.oracleSql — plus
independent pure-Python oracles for queries DuckDB cannot express
(q23 minhash+LSH, q25 simhash, q43 winnowing; VERDICT r04 #7): each is
a deterministic function of its input, so a from-scratch
reimplementation in another language (including its own XXH64) is the
next-best hard signal after a SQL oracle.

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

def _xxh64_long(v: int, seed: int) -> int:
    """Spark XXH64 of one LongType value chained on `seed` (the multi-arg
    xxhash64(...) folds each argument this way, starting at seed 42)."""
    return xxh64((v & _M).to_bytes(8, "little"), seed)

def _xxh64_int(v: int, seed: int) -> int:
    return xxh64((v & 0xFFFFFFFF).to_bytes(4, "little"), seed)

def expected_q23(sf_dir) -> pd.DataFrame:
    """MinHash(64) one-permutation-hashing + LSH(16 bands x 4 rows)
    (mirrors TrainingData.q23MinhashLsh): word-3-gram shingles ->
    xxhash64 per shingle -> per-slot (top-6-bits) signed min with
    rotation densification -> per-band bucket join -> signature-estimated
    Jaccard >= 0.5. Deterministic: bucket membership and est_sim depend
    only on the signatures."""
    from decimal import Decimal, ROUND_HALF_UP
    sigs = {}
    for doc_id, text in _corpus_with_near_dups(sf_dir, drop_words=3):
        tokens = re.split(r"\s+", text.lower())
        n = len(tokens)
        shingles = list(dict.fromkeys(
            " ".join(tokens[i:i + 3]) for i in range(max(n - 3, 0) + 1)))
        slot_min = {}
        gmin = None
        for s in shingles:
            h = xxh64s(s)
            slot = (h & _M) >> 58
            if slot not in slot_min or h < slot_min[slot]:
                slot_min[slot] = h
            if gmin is None or h < gmin:
                gmin = h
        sigs[doc_id] = [
            next((slot_min[(j + k) % 64] for k in range(8)
                  if (j + k) % 64 in slot_min), gmin)
            for j in range(64)]
    buckets = {}
    for doc_id, sig in sigs.items():
        for b in range(16):
            bh = _xxh64_int(b, 42)
            for v in sig[b * 4:b * 4 + 4]:
                bh = _xxh64_long(v, bh)
            buckets.setdefault((b, bh), []).append(doc_id)
    rows = set()
    for ids in buckets.values():
        if not 2 <= len(ids) <= 1024:
            continue
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                lo, hi = min(a, b), max(a, b)
                k = sum(1 for p, q in zip(sigs[lo], sigs[hi]) if p == q)
                if k >= 32:  # est_sim = k/64 >= 0.5, filtered pre-round
                    est = float(Decimal(repr(k / 64.0))
                                .quantize(Decimal("0.0001"), ROUND_HALF_UP))
                    rows.add((lo, hi, est))
    return pd.DataFrame(sorted(rows), columns=["doc_a", "doc_b", "est_sim"])

def _round6(v: float) -> float:
    """Spark round(x, 6): BigDecimal(Double.toString(x)).setScale(6,
    HALF_UP). Python repr() is the same shortest round-trip decimal."""
    from decimal import Decimal, ROUND_HALF_UP
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

def _read_embs(sf_dir):
    """(vec_id, label, emb-as-double) rows; the float32->float64 cast per
    element mirrors Spark's cast(embedding as array<double>)."""
    df = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return [(int(r.vec_id), r.label, [float(x) for x in r.embedding])
            for r in df.itertuples()]

def _cos(a, b) -> float:
    """cosineExpr: sequential left folds in array order (IEEE-exact
    parity with Spark's aggregate/zip_with)."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += x * y
    na = 0.0
    for x in a:
        na += x * x
    nb = 0.0
    for y in b:
        nb += y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))

def _ivf_assign(embs):
    """(vec_id -> (cent_id, sim)): nearest of the 8 seeded centroids
    (vectors 0..7), ties to the lower cent_id (mirrors q27's window)."""
    cents = [(vid, emb) for vid, _, emb in embs if vid < 8]
    out = {}
    for vid, _, emb in embs:
        best = max(((_cos(emb, cemb), -cid) for cid, cemb in cents))
        out[vid] = (-best[1], best[0])
    return out

def expected_q27(sf_dir) -> pd.DataFrame:
    """IVF assignment + per-cluster top-3 (mirrors TrainingData.q27AnnIvf;
    the per-cluster ranking uses the ROUNDED cent_sim, as the Spark window
    does)."""
    embs = _read_embs(sf_dir)
    assign = _ivf_assign(embs)
    clusters = {}
    for vid, (cid, sim) in assign.items():
        clusters.setdefault(cid, []).append((vid, _round6(sim)))
    rows = []
    for cid, members in clusters.items():
        members.sort(key=lambda m: (-m[1], m[0]))
        for rk, (vid, sim) in enumerate(members[:3], start=1):
            rows.append((cid, vid, sim, rk))
    return pd.DataFrame(sorted(rows), columns=["cent_id", "vec_id", "cent_sim", "rk"])

def expected_q48(sf_dir, nprobe=2, top_k=10) -> pd.DataFrame:
    """IVF nprobe probing (mirrors TrainingData.q48IvfNprobe): score only
    the vectors whose assigned centroid is among the nprobe centroids
    nearest the query (vector 0)."""
    embs = _read_embs(sf_dir)
    assign = _ivf_assign(embs)
    qvec = next(emb for vid, _, emb in embs if vid == 0)
    cents = [(vid, emb) for vid, _, emb in embs if vid < 8]
    probed = set(cid for cid, _ in sorted(
        ((cid, _cos(cemb, qvec)) for cid, cemb in cents),
        key=lambda c: (-c[1], c[0]))[:nprobe])
    scored = [(vid, label, assign[vid][0], _round6(_cos(emb, qvec)))
              for vid, label, emb in embs
              if vid != 0 and assign[vid][0] in probed]
    scored.sort(key=lambda s: (-s[3], s[0]))
    return pd.DataFrame(scored[:top_k],
                        columns=["vec_id", "label", "cent_id", "cos_sim"])

def expected_q42(sf_dir) -> pd.DataFrame:
    """Random-hyperplane LSH near-dup pairs (mirrors
    TrainingData.q42EmbeddingLsh): 16-bit sign signature from
    xxhash64-seeded hyperplanes, 4x4-bit band buckets, exact cosine >=
    0.95 on colliding pairs only."""
    base = _read_embs(sf_dir)
    corpus = list(base)
    for vid, label, emb in base:
        if vid % 11 == 0:
            corpus.append((vid + 100000, label,
                           [x * (1.0 + 0.005 * (float((vid + i) % 5) - 2.0))
                            for i, x in enumerate(emb)]))
    embof = {vid: emb for vid, _, emb in corpus}
    sigs = {}
    for vid, _, emb in corpus:
        sig = 0
        for h in range(16):
            dot = 0.0
            for j, x in enumerate(emb):
                t = _xxh64_int(j, _xxh64_int(h, 42))
                dot += x * ((t >> 11) / 9007199254740992.0 - 0.5)
            sig = (sig << 1) | (1 if dot >= 0.0 else 0)
        sigs[vid] = sig
    buckets = {}
    for vid, sig in sigs.items():
        for b in range(4):
            buckets.setdefault((b, (sig >> (b * 4)) & 15), []).append(vid)
    pairs = set()
    for ids in buckets.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                pairs.add((min(a, b), max(a, b)))
    rows = []
    for a, b in sorted(pairs):
        cs = _round6(_cos(embof[a], embof[b]))
        if cs >= 0.95:
            rows.append((a, b, cs))
    return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cos_sim"])

# --------------------------------------- python oracle (q33, partial)

def _img_clamp(v):
    return 0 if v < 0 else 255 if v > 255 else v

def _img_dims_fmt(image_id):
    """ImageKit.dims/fmt (ImageKit.scala:33-42), unsigned-shift parity."""
    hu = xxh64(f"dims:{image_id}".encode("utf-8"))
    w, h = 8 + ((hu >> 8) % 57), 8 + ((hu >> 32) % 57)
    fmt = "jpeg" if (xxh64(f"fmt:{image_id}".encode("utf-8")) & 3) == 0 else "png"
    return w, h, fmt

def _img_pixels(image_id, w, h):
    """ImageKit.pixels (ImageKit.scala:46-74): deterministic gradient +
    ripple RGB; int division and double ops in the Scala loop's order."""
    seed = xxh64(f"px:{image_id}".encode("utf-8"))
    p0, p1, p2 = seed & 0xFF, (seed >> 8) & 0xFF, (seed >> 16) & 0xFF
    fx, fy = 1 + ((seed >> 24) & 3), 1 + ((seed >> 26) & 3)
    out = []
    for y in range(h):
        for x in range(w):
            gx = (x * 255) // max(1, w - 1)
            gy = (y * 255) // max(1, h - 1)
            ripple = int(16 * math.sin(fx * math.pi * x / w)
                         * math.cos(fy * math.pi * y / h))
            luma = _img_clamp(64 + (gx + gy) // 4 + ripple)
            out.append((_img_clamp(luma + (p0 & 15)) << 16)
                       | (_img_clamp(luma + (p1 & 15)) << 8)
                       | _img_clamp(luma + (p2 & 15)))
    return out

def _img_brightness(px):
    """q33's rounded mean brightness: sequential double fold in array
    order, then java.lang.Math.round semantics — floor(x + 1/2) in EXACT
    arithmetic (JDK-8010430). Decimal keeps the +0.5 exact; a plain
    float x*100 + 0.5 can double-round across an integer boundary when
    x*100 sits one ulp below n - 0.5 (ADVICE r05)."""
    from decimal import Decimal, ROUND_FLOOR
    s = 0.0
    for p in px:
        s += (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3.0
    x = Decimal(s / len(px) * 100.0) + Decimal("0.5")
    return int(x.to_integral_value(rounding=ROUND_FLOOR)) / 100.0

def _img_phash(px, w, h):
    """ImageKit.phashOfPixels (ImageKit.scala:119-144): 8x8 area-mean
    average hash, row-major MSB-first, signed 64-bit."""
    cell, cnt = [0.0] * 64, [0] * 64
    for y in range(h):
        cy = min(7, y * 8 // h)
        for x in range(w):
            cx = min(7, x * 8 // w)
            p = px[y * w + x]
            gray = (0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF)
                    + 0.114 * (p & 0xFF))
            cell[cy * 8 + cx] += gray
            cnt[cy * 8 + cx] += 1
    mean = 0.0
    for i in range(64):
        if cnt[i] > 0:
            cell[i] /= cnt[i]
        mean += cell[i]
    mean /= 64
    bits = 0
    for i in range(64):
        if cell[i] > mean:
            bits |= 1 << (63 - i)
    return _signed(bits)

def check_q33(sf_dir, got: pd.DataFrame) -> bool:
    """PARTIAL independent oracle for q33_multimodal_features
    (TrainingData.q33MultimodalFeatures): vec_id/image_id/fmt/w/h are
    exact for every row, brightness and phash are exact for the lossless
    PNG rows (decode == generator pixels). JPEG rows' brightness/phash
    and all n_bytes depend on javax.imageio's encoder output, which a
    cross-language oracle cannot reproduce byte-for-byte — those cells
    are bounded here (brightness within 1.0, phash hamming <= 8,
    n_bytes > 0); the byte-exact JPEG spec (PSNR >= 40) lives in the
    ScalaTest suite."""
    name = "q33_multimodal_features (py, partial)"
    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    vids = sorted(int(v) for v in emb.vec_id.unique() if int(v) < 64)
    got = got.sort_values("vec_id", ignore_index=True)
    if got.vec_id.tolist() != vids:
        print(f"FAIL {name}: vec_ids spark={len(got)} oracle={len(vids)}")
        return False
    mism = 0
    for r in got.itertuples():
        iid = f"img-{int(r.vec_id):08d}"
        w, h, fmt = _img_dims_fmt(iid)
        errs = []
        if (r.image_id, r.fmt, int(r.w), int(r.h)) != (iid, fmt, w, h):
            errs.append(f"meta spark=({r.image_id},{r.fmt},{r.w},{r.h})"
                        f" oracle=({iid},{fmt},{w},{h})")
        if int(r.n_bytes) <= 0:
            errs.append(f"n_bytes={r.n_bytes}")
        px = _img_pixels(iid, w, h)
        bright, ph = _img_brightness(px), _img_phash(px, w, h)
        if fmt == "png":
            if float(r.brightness) != bright:
                errs.append(f"brightness spark={r.brightness!r} oracle={bright!r}")
            if int(r.phash) != ph:
                errs.append(f"phash spark={r.phash} oracle={ph}")
        else:
            if abs(float(r.brightness) - bright) > 1.0:
                errs.append(f"jpeg brightness spark={r.brightness!r} gen={bright!r}")
            if bin((int(r.phash) ^ ph) & _M).count("1") > 8:
                errs.append(f"jpeg phash hamming spark={r.phash} gen={ph}")
        for e in errs:
            if mism < 3:
                print(f"  {name}[vec_id={r.vec_id}]: {e}")
            mism += 1
    if mism:
        print(f"FAIL {name}: {mism} value mismatches")
        return False
    print(f"ok   {name} ({len(got)} rows; png-exact, jpeg-bounded)")
    return True

PY_ORACLES = {
    "q23_minhash_lsh": expected_q23,
    "q25_simhash": expected_q25,
    "q27_ann_ivf": expected_q27,
    "q42_embedding_lsh": expected_q42,
    "q43_winnow_fingerprints": expected_q43,
    "q48_ivf_nprobe": expected_q48,
}

# Custom comparators (sf_dir, spark_df) -> bool, for queries whose oracle
# can only be partial cross-language (see check_q33's docstring).
PY_CHECKERS = {
    "q33_multimodal_features": check_q33,
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
            # visible, not silent (ADVICE r05): a full Verify run that
            # stops dumping a query must not read as green coverage
            print(f"skip {name} (py): no spark output at {spark_path}")
            continue
        try:
            ok = compare(name + " (py)", pd.read_parquet(spark_path), fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name} (py): {e}"); ok = False
        n_ok, n_bad = n_ok + ok, n_bad + (not ok)
    for name, fn in sorted(PY_CHECKERS.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"skip {name} (py): no spark output at {spark_path}")
            continue
        try:
            ok = fn(sf_dir, pd.read_parquet(spark_path))
        except Exception as e:
            print(f"FAIL {name} (py): {e}"); ok = False
        n_ok, n_bad = n_ok + ok, n_bad + (not ok)
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
