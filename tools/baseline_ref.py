#!/usr/bin/env python3
"""Baseline protocol (dev tool, not shipped code).

The reference (CocoLB/08-Movies-ETL) is a single-process pandas pipeline
with no published benchmark, so the 2x perf gate needs a measurable
baseline: this script implements the SAME headline operations, with the
same semantics as the graft queries, in idiomatic pandas/numpy (the
reference's own technology), on the same sf parquet tables, on the same
machine. Timings include the parquet read (Spark's bench times include
the scan too).

Usage: baseline_ref.py <sfDir> [key ...]  -> one JSON line, per-op secs
  (optional keys restrict the run — big-SF additions without re-paying
  the whole suite)
"""
import sys, time, json, re, hashlib
import pandas as pd
import numpy as np

ONLY = set()
VALIDATE = None  # verify-dump dir: baselines that RETURN a frame are
                 # row-compared against outDir/<key>/*.parquet


def validate_frame(key, got):
    """Row-compare a baseline frame against the Spark verify dump:
    column-name-sorted, row-sorted, 1e-9 float tolerance."""
    import glob
    files = sorted(glob.glob(f"{VALIDATE}/{key}/*.parquet"))
    if not files:
        print(f"[baseline] {key}: no dump to validate against", file=sys.stderr)
        return
    exp = pd.concat([pd.read_parquet(f) for f in files])

    def canon(df):
        df = df[sorted(df.columns)].copy()
        rows = []
        for row in df.itertuples(index=False):
            out = []
            for v in row:
                if isinstance(v, (np.bool_, bool)):
                    out.append(bool(v))
                elif isinstance(v, float) and np.isnan(v):
                    out.append("NaN")
                elif v is None or v is pd.NA:
                    out.append("NaN")
                elif isinstance(v, (np.integer, int, float, np.floating)):
                    # numeric at the gate's 6dp grain, dtype-insensitive
                    # (an int64 Spark column may read back as nullable
                    # float next to the baseline's python int)
                    out.append(round(float(v), 6))
                else:
                    out.append(str(v))
            rows.append(tuple(out))
        rows.sort(key=lambda r: tuple(str(x) for x in r))
        return rows

    g, e = canon(got), canon(exp)
    if g == e:
        print(f"[baseline] {key}: VALIDATED ({len(g)} rows)", file=sys.stderr)
    else:
        diff = sum(1 for a, b in zip(g, e) if a != b) + abs(len(g) - len(e))
        print(f"[baseline] {key}: MISMATCH rows={len(g)}/{len(e)} "
              f"diffs~{diff}; first got={g[:1]} exp={e[:1]}", file=sys.stderr)


def ts_micros(ts):
    """Epoch microseconds from an events.ts series, dtype-adaptive: the
    driver has generated ts as both datetime64[ns] and datetime64[us]
    across rounds — dividing by 1000 unconditionally yields MILLIseconds
    on a [us] column, which can merge us-distinct ties in strict-after
    comparisons (q27) and shrink windows (s02/s07)."""
    return ts.astype("int64") // (1 if str(ts.dtype).endswith("[us]") else 1000)

def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)

def main(sf):
    P = lambda t: f"{sf}/{t}.parquet"
    res = {}

    def maybe(key, fn):
        if not ONLY or key in ONLY:
            ret = [None]
            def run():
                ret[0] = fn()
            res[key] = timed(run)
            if VALIDATE and ret[0] is not None:
                validate_frame(key, ret[0])

    def q01():
        li = pd.read_parquet(P("lineitem"))
        li = li[li.l_shipdate < "1998-09-03"]
        li.groupby(["l_returnflag", "l_linestatus"]).agg(
            sum_qty=("l_quantity", "sum"), sum_base=("l_extendedprice", "sum"),
            avg_qty=("l_quantity", "mean"), avg_disc=("l_discount", "mean"),
            n=("l_quantity", "size"))
    maybe("q01_agg", q01)

    def q03():
        c = pd.read_parquet(P("customer")); o = pd.read_parquet(P("orders"))
        l = pd.read_parquet(P("lineitem"))
        c = c[c.c_mktsegment == "BUILDING"]
        o = o[o.o_orderdate < "1995-03-15"]
        l = l[l.l_shipdate > "1995-03-15"]
        m = c.merge(o, left_on="c_custkey", right_on="o_custkey").merge(
            l, left_on="o_orderkey", right_on="l_orderkey")
        m["rev"] = m.l_extendedprice * (1 - m.l_discount)
        m.groupby(["l_orderkey", "o_orderdate"]).rev.sum().nlargest(20)
    maybe("q03_join_agg", q03)

    def q05():
        o = pd.read_parquet(P("orders"))
        o.sort_values(["o_orderdate", "o_orderkey"]).drop_duplicates("o_custkey")
    maybe("q05_dedup_key", q05)

    def q07():
        o = pd.read_parquet(P("orders"))
        m = np.floor(o.o_totalprice).astype("int64")
        k = o.o_orderkey % 4
        raw = pd.Series(np.select(
            [k == 0, k == 1, k == 2],
            ["$" + (m // 100).astype(str) + "." + (m % 100).astype(str).str.zfill(2) + " million",
             "$" + (m // 1000).astype(str) + "." + (m % 1000).astype(str).str.zfill(3) + " billion",
             "$" + m.map("{:,}".format)], "N/A"))
        # the reference's parse_dollars applied per row (challenge.py:118)
        def parse(s):
            mm = re.match(r"(?i)^\$\s*(\d+\.?\d*)\s*milli?on", s)
            if mm: return float(mm.group(1)) * 1e6
            mb = re.match(r"(?i)^\$\s*(\d+\.?\d*)\s*billi?on", s)
            if mb: return float(mb.group(1)) * 1e9
            mp = re.match(r"^\$\s*(\d{1,3}(?:[,\.]\d{3})+)", s)
            if mp: return float(re.sub(r"[,\.]", "", mp.group(1)))
            return np.nan
        raw.apply(parse)
    maybe("q07_parse_dollars", q07)

    def q10():
        o = pd.read_parquet(P("orders"))
        o.pivot_table(index="o_custkey", columns="o_orderstatus",
                      values="o_orderkey", aggfunc="count").fillna(0)
    maybe("q10_pivot", q10)

    def q12():
        o = pd.read_parquet(P("orders"))
        o.sort_values(["o_totalprice", "o_orderkey"],
                      ascending=[False, True]).groupby("o_custkey").head(3)
    maybe("q12_window_topn", q12)

    def q19():
        o = pd.read_parquet(P("orders")); c = pd.read_parquet(P("customer"))
        o = o[o.o_orderstatus.isin(["O", "F", "P"])]
        m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
        m["pc"] = m.o_orderpriority.str[:1]
        m.groupby(["c_mktsegment", "pc"]).agg(
            n=("o_orderkey", "size"), rev=("o_totalprice", "sum"),
            bal=("c_acctbal", "mean"))
    maybe("q19_etl_pipeline", q19)

    def d01():
        d = pd.read_parquet(P("documents"))
        dd = pd.concat([d, d.assign(doc_id=d.doc_id + 1000000)])
        dd["h"] = dd.text.map(lambda t: hashlib.sha256(t.encode()).hexdigest())
        dd.groupby("h").agg(keep=("doc_id", "min"), n=("doc_id", "size"))
    maybe("d01_dedup_exact", d01)

    def d02():
        d = pd.read_parquet(P("documents"))
        sh = {}
        for i, t in zip(d.doc_id, d.text):
            toks = t.split()
            sh[i] = {" ".join(toks[j:j+3]) for j in range(len(toks) - 2)}
        inv = {}
        for i, ss in sh.items():
            for s in ss: inv.setdefault(s, []).append(i)
        from collections import Counter
        inter = Counter()
        for ids in inv.values():
            if len(ids) > 64:  # df cutoff — same semantics as the capped catalog query
                continue
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    inter[(ids[x], ids[y])] += 1
        [(a, b) for (a, b), c in inter.items()
         if c / (len(sh[a]) + len(sh[b]) - c) >= 0.5]
    maybe("d02_ngram_jaccard", d02)

    def d08():
        # containment pairs: same inverted index + df cutoff as d02, but
        # scored as |A∩B| / min(|A|,|B|) — no length prefilter exists
        d = pd.read_parquet(P("documents"))
        sh = {}
        for i, t in zip(d.doc_id, d.text):
            toks = t.split()
            sh[i] = {" ".join(toks[j:j+3]) for j in range(len(toks) - 2)}
        inv = {}
        for i, ss in sh.items():
            for s in ss: inv.setdefault(s, []).append(i)
        from collections import Counter
        inter = Counter()
        for ids in inv.values():
            if len(ids) > 64:
                continue
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    inter[(ids[x], ids[y])] += 1
        [(a, b) for (a, b), c in inter.items()
         if c / min(len(sh[a]), len(sh[b])) >= 0.85]
    maybe("d08_containment", d08)

    def t03():
        d = pd.read_parquet(P("documents"))
        toks = d.text.str.split()
        pd.DataFrame({"n": toks.map(len),
                      "w": d.text.map(lambda t: len(re.findall("[a-z]+", t))),
                      "u": toks.map(lambda x: len(set(x)))})
    maybe("t03_token_count", t03)

    def t04():
        d = pd.read_parquet(P("documents"))
        M, P61 = 1048576, (1 << 61) - 1
        pw = [31 ** e for e in range(8)]
        def fp(t):
            acc = 0
            for i, tok in enumerate(t.split()):
                h = int(hashlib.md5(f"7:{tok}".encode()).hexdigest()[:15], 16) % M
                acc = (acc + h * pw[i % 8]) % P61
            return acc
        d.text.map(fp)
    maybe("t04_fingerprint", t04)

    def t06():
        # per-doc token/bigram repetition stats (top-count and duplicate
        # fractions), Counter per row — the idiomatic pandas form
        from collections import Counter
        d = pd.read_parquet(P("documents"))
        rows = []
        for i, t in zip(d.doc_id, d.text):
            toks = t.split()
            tc = Counter(toks)
            n = len(toks)
            bc = Counter(zip(toks, toks[1:]))
            bn = sum(bc.values())
            rows.append((i, n,
                         max(tc.values()) / n if n else 0.0,
                         (n - len(tc)) / n if n else 0.0,
                         bn,
                         max(bc.values()) / bn if bn else 0.0,
                         (bn - len(bc)) / bn if bn else 0.0))
        pd.DataFrame(rows, columns=["doc_id", "n_tokens", "top_tok_frac",
                                    "dup_tok_frac", "n_2grams",
                                    "top_2gram_frac", "dup_2gram_frac"])
    maybe("t06_repetition", t06)

    def t08():
        # corpus-relative rare/hapax token counts — Counter over the
        # whole corpus, then per-row membership scans (idiomatic pandas:
        # there is no way to avoid the python-level loops).
        from collections import Counter
        d = pd.read_parquet(P("documents"))
        toks = d.text.str.split()
        tf = Counter()
        for t in toks:
            tf.update(t)
        rare = {w for w, c in tf.items() if c <= 2}
        hapax = {w for w, c in tf.items() if c == 1}
        n = toks.map(len)
        nr = toks.map(lambda t: sum(1 for w in t if w in rare))
        toks.map(lambda t: sum(1 for w in t if w in hapax))
        (nr / n).round(6)
    maybe("t08_rare_token_score", t08)

    def d10():
        # cross-doc duplicated 8-token spans with keep-first masking
        from collections import Counter
        K = 8
        d = pd.read_parquet(P("documents"))
        def spans(t):
            ws = t.split()
            return list({" ".join(ws[i:i + K]) for i in range(len(ws) - K + 1)}) \
                if len(ws) >= K else []
        sp = d.text.map(spans)
        cnt = Counter(); keeper = {}
        for did, ss in zip(d.doc_id, sp):
            for s_ in ss:
                cnt[s_] += 1
                if s_ not in keeper or did < keeper[s_]:
                    keeper[s_] = did
        dup = {s_ for s_, c in cnt.items() if c >= 2}
        nd = [sum(1 for s_ in ss if s_ in dup) for ss in sp]
        [sum(1 for s_ in ss if s_ in dup and did != keeper[s_])
         for did, ss in zip(d.doc_id, sp)]
        pd.Series(nd) / sp.map(len).clip(lower=1)
    maybe("d10_span_dup", d10)

    def d11():
        # span masking: window df/keeper dicts, then per-doc position
        # union + token rebuild
        from collections import Counter
        K = 8
        d = pd.read_parquet(P("documents"))
        tks = d.text.map(str.split)
        wins = [[(i, " ".join(t[i:i + K])) for i in range(len(t) - K + 1)]
                for t in tks]
        cnt = Counter(); keeper = {}
        for did, ws in zip(d.doc_id, wins):
            for w in {w for _, w in ws}:
                cnt[w] += 1
                if w not in keeper or did < keeper[w]:
                    keeper[w] = did
        out = []
        for did, t, ws in zip(d.doc_id, tks, wins):
            mask = set()
            for i, w in ws:
                if cnt[w] >= 2 and keeper[w] != did:
                    mask.update(range(i, i + K))
            out.append((len(mask),
                        " ".join("[DUP]" if j in mask else tok
                                 for j, tok in enumerate(t))))
    maybe("d11_span_mask", d11)

    def e07():
        # deterministic k-means (same seeds/sample/iters as the Spark
        # trainer) + per-cell label mode — numpy/BLAS form
        e = pd.read_parquet(P("embeddings"))
        V = np.stack(e.embedding.to_numpy()).astype(np.float64)
        ids = e.vec_id.to_numpy(); labs = e.label.to_numpy()
        C = V[ids < 16].copy()
        h = np.array([int(hashlib.md5(f"23:{i}".encode()).hexdigest()[:15], 16) % 1000
                      for i in ids])
        T = V[h < 250]
        def assign(X, C):
            s = (X @ C.T) / (np.linalg.norm(X, axis=1)[:, None]
                             * np.linalg.norm(C, axis=1)[None, :])
            return np.argmax(s, axis=1)
        for _ in range(2):
            a = assign(T, C)
            for c in np.unique(a):
                C[c] = np.floor(T[a == c] * 1e6).sum(axis=0) / (np.sum(a == c) * 1e6)
        cells = assign(V, C)
        for c in np.unique(cells):
            np.bincount(labs[cells == c]).argmax()
    maybe("e07_cluster_stats", e07)

    def x07():
        # data-card cube: cells once, then the three margins
        d = pd.read_parquet(P("documents"))
        d = d.assign(tok=d.text.str.split().map(len))
        cells = d.groupby(["lang", "source"]).agg(
            n=("doc_id", "size"), tok=("tok", "sum"), ch=("n_chars", "sum"))
        cells.groupby("lang").sum(); cells.groupby("source").sum(); cells.sum()
    maybe("x07_datasheet", x07)

    def e01():
        e = pd.read_parquet(P("embeddings"))
        V = np.stack(e.embedding.to_numpy()).astype(np.float64)
        ids = e.vec_id.to_numpy()
        Q = V[ids % 100 == 0]
        sims = (Q @ V.T) / (np.linalg.norm(Q, axis=1)[:, None] * np.linalg.norm(V, axis=1)[None, :])
        np.argsort(-np.round(sims, 6), axis=1)[:, :11]
    maybe("e01_knn_brute", e01)

    def e12():
        e = pd.read_parquet(P("embeddings"))
        V = np.stack(e.embedding.to_numpy()).astype(np.float64)
        ids = e.vec_id.to_numpy()
        norms = np.linalg.norm(V, axis=1)
        rows = []
        for qi in np.where(ids % 100 == 0)[0]:
            cos6 = np.round((V @ V[qi]) / (norms * norms[qi]), 6)
            cos6[qi] = -np.inf
            order = np.lexsort((ids, -cos6))[:30]
            rel = np.round(cos6[order] * 1e6).astype(np.int64)
            pids = ids[order]
            PV, pn = V[order], norms[order]
            S = np.round(np.round((PV @ PV.T) / np.outer(pn, pn), 6)
                         * 1e6).astype(np.int64)
            taken, rem = [], list(range(len(order)))
            for step in range(min(10, len(order))):
                best, bs = None, None
                for c in rem:
                    score = rel[c] if not taken else \
                        rel[c] - max(S[c][t] for t in taken)
                    if best is None or score > bs or \
                       (score == bs and pids[c] < pids[best]):
                        best, bs = c, score
                taken.append(best); rem.remove(best)
                rows.append((int(ids[qi]), int(pids[best]), int(rel[best]),
                             int(bs), len(taken)))
        return pd.DataFrame(rows, columns=[
            "q_id", "c_id", "rel_micros", "mmr_micros", "rnk"])
    maybe("e12_mmr_rerank", e12)

    def e13():
        # MMR over the IVF×PQ ANN pool — e12's rerank at its scaled pool:
        # coarse k-means cells (e07's trainer) + per-subspace PQ recon
        # (e04's), probe top-3 cells, ADC only inside them, exact re-rank
        # at the engine's shared depth rule max(30, n/20), pool = top-30,
        # then the same greedy MMR loop as e12
        e = pd.read_parquet(P("embeddings"))
        V = np.stack(e.embedding.to_numpy()).astype(np.float64)
        ids = e.vec_id.to_numpy()
        norms = np.linalg.norm(V, axis=1)

        def cosm(A, B):
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            return An @ Bn.T
        hv = np.array([int(hashlib.md5(f"23:{i}".encode()).hexdigest()[:15], 16) % 1000
                       for i in ids])
        train_mask = hv < 250
        # coarse quantizer (16 cells, 2 Lloyd rounds on the sample)
        C = V[ids < 16].copy()
        T = V[train_mask]
        for _ in range(2):
            a = cosm(T, C).argmax(1)
            C = np.stack([np.floor(T[a == c] * 1e6).sum(axis=0)
                          / (np.sum(a == c) * 1e6) if (a == c).any() else C[c]
                          for c in range(len(C))])
        cells = cosm(V, C).argmax(1)
        # per-subspace PQ reconstruction
        M, SD, KC, ITERS = 4, 16, 16, 2
        recon = np.empty_like(V)
        for m in range(M):
            S = V[:, m*SD:(m+1)*SD]
            cent = S[ids < KC].copy()
            Tm = S[train_mask]
            for _ in range(ITERS):
                a = cosm(Tm, cent).argmax(1)
                cent = np.stack([Tm[a == c].mean(0) if (a == c).any() else cent[c]
                                 for c in range(len(cent))])
            recon[:, m*SD:(m+1)*SD] = cent[cosm(S, cent).argmax(1)]
        qmask = ids % 100 == 0
        Q = V[qmask]; qids = ids[qmask]
        depth = max(30, len(ids) // 20)
        probes = np.argsort(-cosm(Q, C), axis=1)[:, :3]
        rows = []
        for qi in range(len(qids)):
            cand = np.where(np.isin(cells, probes[qi]) & (ids != qids[qi]))[0]
            adc = cosm(Q[qi:qi+1], recon[cand])[0]
            if len(cand) > depth:
                cand = cand[np.argpartition(-adc, depth)[:depth]]
            cos6 = np.round(cosm(Q[qi:qi+1], V[cand])[0], 6)
            order = cand[np.lexsort((ids[cand], -cos6))[:30]]
            cos6 = np.round(cosm(Q[qi:qi+1], V[order])[0], 6)
            rel = np.round(cos6 * 1e6).astype(np.int64)
            pids = ids[order]
            PV, pn = V[order], norms[order]
            S2 = np.round(np.round((PV @ PV.T) / np.outer(pn, pn), 6)
                          * 1e6).astype(np.int64)
            taken, rem = [], list(range(len(order)))
            for step in range(min(10, len(order))):
                best, bs = None, None
                for c in rem:
                    score = rel[c] if not taken else \
                        rel[c] - max(S2[c][t] for t in taken)
                    if best is None or score > bs or \
                       (score == bs and pids[c] < pids[best]):
                        best, bs = c, score
                taken.append(best); rem.remove(best)
                rows.append((int(qids[qi]), int(pids[best]), int(rel[best]),
                             int(bs), len(taken)))
        return pd.DataFrame(rows, columns=[
            "q_id", "c_id", "rel_micros", "mmr_micros", "rnk"])
    maybe("e13_mmr_ann", e13)

    def e15():
        # dense-index takedown: quantizers trained on the FULL corpus
        # (frozen — production never retrains on delete), the index and
        # the query set restricted to live ids (vec_id % 10 != 3), then
        # e05's probe → ADC shortlist (depth calibrated on the
        # PRE-delete corpus count, as the engine's stored calibration
        # is) → exact re-rank top-10.
        e = pd.read_parquet(P("embeddings"))
        V = np.stack(e.embedding.to_numpy()).astype(np.float64)
        ids = e.vec_id.to_numpy()

        def cosm(A, B):
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            return An @ Bn.T
        hv = np.array([int(hashlib.md5(f"23:{i}".encode()).hexdigest()[:15], 16) % 1000
                       for i in ids])
        train_mask = hv < 250
        C = V[ids < 16].copy()
        T = V[train_mask]
        for _ in range(2):
            a = cosm(T, C).argmax(1)
            C = np.stack([np.floor(T[a == c] * 1e6).sum(axis=0)
                          / (np.sum(a == c) * 1e6) if (a == c).any() else C[c]
                          for c in range(len(C))])
        cells = cosm(V, C).argmax(1)
        M, SD, KC, ITERS = 4, 16, 16, 2
        recon = np.empty_like(V)
        for m in range(M):
            S = V[:, m*SD:(m+1)*SD]
            cent = S[ids < KC].copy()
            Tm = S[train_mask]
            for _ in range(ITERS):
                a = cosm(Tm, cent).argmax(1)
                cent = np.stack([Tm[a == c].mean(0) if (a == c).any() else cent[c]
                                 for c in range(len(cent))])
            recon[:, m*SD:(m+1)*SD] = cent[cosm(S, cent).argmax(1)]
        live = ids % 10 != 3
        qmask = (ids % 100 == 0) & live
        Q = V[qmask]; qids = ids[qmask]
        depth = max(30, len(ids) // 20)
        probes = np.argsort(-cosm(Q, C), axis=1)[:, :3]
        rows = []
        for qi in range(len(qids)):
            cand = np.where(np.isin(cells, probes[qi]) & live
                            & (ids != qids[qi]))[0]
            adc6 = np.round(cosm(Q[qi:qi+1], recon[cand])[0], 6)
            short = cand[np.lexsort((ids[cand], -adc6))[:depth]]
            cos6 = np.round(cosm(Q[qi:qi+1], V[short])[0], 6)
            top = short[np.lexsort((ids[short], -cos6))[:10]]
            cos6 = np.round(cosm(Q[qi:qi+1], V[top])[0], 6)
            rows.extend((int(qids[qi]), int(ids[top[r]]), float(cos6[r]), r + 1)
                        for r in range(len(top)))
        return pd.DataFrame(rows, columns=["q_id", "c_id", "cosine", "rnk"])
    maybe("e15_index_delete", e15)

    def e17():
        # composed dense-index lifecycle: quantizers trained on the 60%
        # BASE slice and frozen through append -> delete -> append
        # (encoding is a per-vector map, so the single encode pass over
        # the survivor set IS the composed index), index and query
        # restricted to the composed survivors, e05's probe -> ADC
        # shortlist -> exact re-rank.
        e = pd.read_parquet(P("embeddings"))
        V = np.stack(e.embedding.to_numpy()).astype(np.float64)
        ids = e.vec_id.to_numpy()

        def cosm(A, B):
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            return An @ Bn.T
        basemask = ~np.isin(ids % 5, [0, 1])
        hv = np.array([int(hashlib.md5(f"23:{i}".encode()).hexdigest()[:15], 16) % 1000
                       for i in ids])
        train_mask = (hv < 250) & basemask
        C = V[(ids < 16) & basemask].copy()
        T = V[train_mask]
        for _ in range(2):
            a = cosm(T, C).argmax(1)
            C = np.stack([np.floor(T[a == c] * 1e6).sum(axis=0)
                          / (np.sum(a == c) * 1e6) if (a == c).any() else C[c]
                          for c in range(len(C))])
        cells = cosm(V, C).argmax(1)
        M, SD, KC, ITERS = 4, 16, 16, 2
        recon = np.empty_like(V)
        for m in range(M):
            S = V[:, m*SD:(m+1)*SD]
            cent = S[(ids < KC) & basemask].copy()
            Tm = S[train_mask]
            for _ in range(ITERS):
                a = cosm(Tm, cent).argmax(1)
                cent = np.stack([Tm[a == c].mean(0) if (a == c).any() else cent[c]
                                 for c in range(len(cent))])
            recon[:, m*SD:(m+1)*SD] = cent[cosm(S, cent).argmax(1)]
        live = ~((ids % 10 == 3) & (ids % 3 != 0))
        qmask = (ids % 100 == 0) & live
        Q = V[qmask]; qids = ids[qmask]
        depth = max(30, len(ids) // 20)
        probes = np.argsort(-cosm(Q, C), axis=1)[:, :3]
        rows = []
        for qi in range(len(qids)):
            cand = np.where(np.isin(cells, probes[qi]) & live
                            & (ids != qids[qi]))[0]
            adc6 = np.round(cosm(Q[qi:qi+1], recon[cand])[0], 6)
            short = cand[np.lexsort((ids[cand], -adc6))[:depth]]
            cos6 = np.round(cosm(Q[qi:qi+1], V[short])[0], 6)
            top = short[np.lexsort((ids[short], -cos6))[:10]]
            cos6 = np.round(cosm(Q[qi:qi+1], V[top])[0], 6)
            rows.extend((int(qids[qi]), int(ids[top[r]]), float(cos6[r]), r + 1)
                        for r in range(len(top)))
        return pd.DataFrame(rows, columns=["q_id", "c_id", "cosine", "rnk"])
    maybe("e17_index_lifecycle", e17)

    def e04():
        # product-quantization ANN, numpy/BLAS form: per-subspace
        # 16-centroid spherical k-means (2 Lloyd rounds on the same 25%
        # md5-membership sample the engine trains on), encode + reconstruct,
        # ADC scan of every query against reconstructions, then the exact
        # re-rank at the engine's shared depth rule max(30, n/20) — the
        # same work the e04 plan distributes
        e = pd.read_parquet(P("embeddings"))
        V = np.stack(e.embedding.to_numpy()).astype(np.float64)
        ids = e.vec_id.to_numpy()
        def cosm(A, B):
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
            return An @ Bn.T
        hv = np.array([int(hashlib.md5(f"23:{i}".encode()).hexdigest()[:15], 16) % 1000
                       for i in ids])
        train_mask = hv < 250
        M, SD, K, ITERS = 4, 16, 16, 2
        recon = np.empty_like(V)
        for m in range(M):
            S = V[:, m*SD:(m+1)*SD]
            cent = S[ids < K].copy()
            T = S[train_mask]
            for _ in range(ITERS):
                a = cosm(T, cent).argmax(1)
                cent = np.stack([T[a == c].mean(0) if (a == c).any() else cent[c]
                                 for c in range(len(cent))])
            recon[:, m*SD:(m+1)*SD] = cent[cosm(S, cent).argmax(1)]
        qmask = ids % 100 == 0
        Q = V[qmask]; qids = ids[qmask]
        depth = max(30, len(ids) // 20)
        adc = cosm(Q, recon)
        adc[np.equal.outer(qids, ids)] = -np.inf
        short = np.argpartition(-adc, depth, axis=1)[:, :depth]
        for qi in range(len(qids)):
            s = cosm(Q[qi:qi+1], V[short[qi]])[0]
            np.argsort(-np.round(s, 6))[:10]
    maybe("e04_pq_ann", e04)

    def s02():
        ev = pd.read_parquet(P("events"))
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        us = ts_micros(ev.ts)
        new = (us.groupby(ev.user_id).diff().isna() |
               (us.groupby(ev.user_id).diff() > 1800000000)).astype(int)
        sess = new.groupby(ev.user_id).cumsum()
        ev.assign(sess=sess, us=us).groupby(["user_id", "sess"]).agg(
            n=("event_id", "size"), a=("us", "min"), b=("us", "max"),
            v=("value", "sum"))
    maybe("s02_sessionize", s02)

    def m01():
        # round-4 semantics: synthesize real PNG/JPEG headers, then parse
        # them back with byte arithmetic (struct), as a pandas user would
        # handle a binary payload column (per-row Python, no vectorization
        # for byte parsing)
        import struct
        d = pd.read_parquet(P("documents"))
        PNG_PRE = bytes.fromhex("89504E470D0A1A0A0000000D49484452")
        PNG_POST = bytes.fromhex("0806000000AA5500FF")
        JPG_PRE = bytes.fromhex("FFD8FFE000104A46494600010100000100010000FFC0001108")
        JPG_POST = bytes.fromhex("03012200021101031101FFD9")
        def build(row):
            w = 64 + row.doc_id % 1920
            h = 64 + row.n_chars % 1080
            if row.doc_id % 2 == 0:
                return PNG_PRE + struct.pack(">II", w, h) + PNG_POST
            return JPG_PRE + struct.pack(">HH", h, w) + JPG_POST
        def parse(b):
            if b[:8] == PNG_PRE[:8] and b[12:16] == b"IHDR":
                return (len(b),) + struct.unpack(">II", b[16:24]) + ("png",)
            if b[0] == 0xFF and b[1] == 0xD8:
                i = 2
                while i + 9 <= len(b) and b[i] == 0xFF:
                    if b[i + 1] in (0xC0, 0xC1, 0xC2):
                        h, w = struct.unpack(">HH", b[i + 5:i + 9])
                        return (len(b), w, h, "jpeg")
                    i += 2 + struct.unpack(">H", b[i + 2:i + 4])[0]
            return (len(b), 0, 0, "unknown")
        d.apply(build, axis=1).map(parse)
    maybe("m01_multimodal_meta", m01)

    def x01():
        d = pd.read_parquet(P("documents"))
        bucket = d.doc_id.map(lambda i: int(hashlib.md5(f"11:{i}".encode()).hexdigest()[:15], 16) % 1000)
        rate = d.lang.map(lambda l: 500 if l == "en" else (800 if l == "zh" else 1000))
        d[bucket < rate]
    maybe("x01_hash_sample", x01)

    def x02():
        d = pd.read_parquet(P("documents"))
        n = d.text.map(lambda t: len(re.split(r"\s+", t)))  # \s+ split, as the Spark plan
        shard = d.doc_id.map(lambda i: int(hashlib.md5(f"13:{i}".encode()).hexdigest()[:15], 16) % 8)
        f = pd.DataFrame({"doc_id": d.doc_id, "n": n, "shard": shard}).sort_values(["shard", "doc_id"])
        cum = f.groupby("shard").n.cumsum()
        f["pack"] = (cum - f.n) // 2048
        f.groupby(["shard", "pack"]).agg(n_docs=("doc_id", "size"), tokens=("n", "sum"),
                                         first=("doc_id", "min"), last=("doc_id", "max"))
    maybe("x02_seq_pack", x02)

    def x03():
        d = pd.read_parquet(P("documents"))
        K, SPACE = 256, 1 << 60
        out = {}
        for lang, texts in d.groupby("lang").text:
            vocab = set()
            for t in texts: vocab.update(re.split(r"\s+", t))  # \s+ split, as the Spark plan
            hs = sorted({int(hashlib.md5(f"17:{w}".encode()).hexdigest()[:15], 16) for w in vocab})
            out[lang] = (len(hs), len(hs) if len(hs) < K else round((K - 1) * SPACE / hs[K - 1], 6))
    maybe("x03_kmv_distinct", x03)

    # ---- curation composition (x08) + incremental merge (x09), the
    # reference-technology form: dict/Counter passes for the five stages,
    # numpy for the minhash affine family, union-find for components —
    # the same semantics (md5 seeds, thresholds, keeper policy) as the
    # gated Spark keys, in idiomatic single-process pandas/python ----
    from collections import Counter
    MHM = 1 << 30
    MA = np.array([((2654435761 * (j + 1)) % MHM) | 1 for j in range(16)])
    MB = np.array([(1779033703 * (j + 1)) % MHM for j in range(16)])

    def h60(s, seed):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    def doc_pass(df):
        """Per-doc stage-0 inputs: token stats, quality, decontam grams."""
        st = {}
        for did, t, nch in zip(df.doc_id, df.text, df.n_chars):
            toks = t.split()
            n = len(toks) if toks else 1
            tc = Counter(toks)
            top = max(tc.values()) if tc else 0
            dist = len(tc)
            keep = not (n < 30 or top * 8 > n or dist * 5 < 2 * n)
            nstop = tc.get("the", 0) + tc.get("a", 0)
            q = round(min(nch, 500) / 500 * 0.5 + (1 - nstop / n) * 0.3
                      + dist / n * 0.2, 6)
            grams = {h60(" ".join(toks[i:i + 8]), 19) for i in range(n - 7)} \
                if len(toks) >= 8 else set()
            sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)} \
                if len(toks) >= 3 else set()
            st[did] = (h60(str(did), 19) % 20 == 0, keep, q, grams, sh)
        return st

    def stages_of(st, bench_grams):
        out = {}
        for did, (isb, keep, q, grams, _) in st.items():
            out[did] = ("benchmark" if isb else
                        "low_quality" if not keep else
                        "contaminated" if grams & bench_grams else "clean")
        return out

    def band_table(sh_map):
        """(band, 4-row sig) -> [doc_id]; same affine minhash family."""
        bands = {}
        for did, ss in sh_map.items():
            if not ss:
                continue
            hb = np.fromiter((h60(s_, 0) % MHM for s_ in ss), dtype=np.int64)
            sig = ((hb[:, None] * MA[None, :] + MB[None, :]) % MHM).min(0)
            for b in range(4):
                bands.setdefault((b, tuple(sig[b * 4:(b + 1) * 4])), []).append(did)
        return bands

    def verified_pairs(bands, sh_map):
        cand = set()
        for ids in bands.values():
            ids = sorted(set(ids))
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    cand.add((ids[x], ids[y]))
        return [(a, b) for a, b in cand
                if round(len(sh_map[a] & sh_map[b])
                         / len(sh_map[a] | sh_map[b]), 6) >= 0.5]

    def cc_min(ids, pairs):
        parent = {i: i for i in ids}
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {i: find(i) for i in ids}

    def split_of(did):
        b = h60(str(did), 29) % 100
        return "train" if b < 90 else ("val" if b < 95 else "test")

    def assemble(stages, labels, quality):
        rows = []
        groups = {}
        for did, lbl in labels.items():
            g = groups.setdefault(lbl, [0, None, -2.0])
            g[0] += 1
            q = quality[did]
            if (q, -did) > (g[2], -(g[1] if g[1] is not None else 1 << 62)):
                g[1], g[2] = did, q
        for did, stg in stages.items():
            if stg != "clean":
                rows.append((did, stg, -1, 0, -1, "none", False))
            else:
                lbl = labels[did]
                size_, keeper, _ = groups[lbl]
                kept = did == keeper
                rows.append((did, "kept" if kept else "duplicate", lbl, size_,
                             keeper, split_of(did) if kept else "none", kept))
        return pd.DataFrame(rows, columns=["doc_id", "stage", "group_id",
                                           "group_size", "keeper_id",
                                           "split", "keep"])

    def curation_decide(df):
        st = doc_pass(df)
        bench_grams = set().union(*(g for isb, _, _, g, _ in st.values() if isb),
                                  set())
        stages = stages_of(st, bench_grams)
        sh_clean = {d: st[d][4] for d, s_ in stages.items() if s_ == "clean"}
        pairs = verified_pairs(band_table(sh_clean), sh_clean)
        labels = cc_min(list(sh_clean), pairs)
        quality = {d: st[d][2] for d in sh_clean}
        return assemble(stages, labels, quality)

    def x08():
        curation_decide(pd.read_parquet(P("documents")))
    maybe("x08_curation_decide", x08)

    def x09():
        # the incremental merge, self-contained like the gated key:
        # build base state (doc_id % 5 != 0), then merge the 20% batch —
        # batch stages against the combined bench-gram set, newly
        # contaminated base docs found via the persisted gram index,
        # touched components re-solved from the persisted pair graph,
        # batch docs probed against the live band table, merge CC over
        # the touched graph only, full decision frame re-assembled.
        d = pd.read_parquet(P("documents"))
        base, batch = d[d.doc_id % 5 != 0], d[d.doc_id % 5 == 0]
        # --- state build (the once-per-corpus half) ---
        stB = doc_pass(base)
        bgBase = set().union(*(g for isb, _, _, g, _ in stB.values() if isb), set())
        stagesB = stages_of(stB, bgBase)
        shC = {x: stB[x][4] for x, s_ in stagesB.items() if s_ == "clean"}
        bandsC = band_table(shC)
        pairsC = verified_pairs(bandsC, shC)
        labelsC = cc_min(list(shC), pairsC)
        gram_index = {}
        for x, s_ in stagesB.items():
            if s_ == "clean":
                for gh in stB[x][3]:
                    gram_index.setdefault(gh, []).append(x)
        # --- the merge (the per-batch half) ---
        stN = doc_pass(batch)
        bgNew = set().union(*(g for isb, _, _, g, _ in stN.values() if isb), set())
        stagesN = stages_of(stN, bgBase | bgNew)
        removed = {x for gh in bgNew for x in gram_index.get(gh, ())}
        touched = {labelsC[x] for x in removed}
        survivors = {x for x, l in labelsC.items()
                     if l in touched and x not in removed}
        sub_edges = [(a, b) for a, b in pairsC
                     if labelsC[a] in touched
                     and a not in removed and b not in removed]
        shN = {x: stN[x][4] for x, s_ in stagesN.items() if s_ == "clean"}
        bandsN = band_table(shN)
        cand = set()
        for key, ids in bandsN.items():
            live = [x for x in bandsC.get(key, ()) if x not in removed]
            for a in ids:
                for b in live + [x for x in ids if x != a]:
                    cand.add((min(a, b), max(a, b)))
        shAll = {**shC, **shN}
        new_pairs = [(a, b) for a, b in cand
                     if round(len(shAll[a] & shAll[b])
                              / len(shAll[a] | shAll[b]), 6) >= 0.5]
        # merge CC in mixed label space over edge-incident ids only
        lift = lambda x: labelsC.get(x, x) if x not in removed and \
            x in labelsC and labelsC[x] not in touched else x
        edges = sub_edges + [(lift(a), lift(b)) for a, b in new_pairs]
        verts = {v for e in edges for v in e}
        merged = cc_min(verts, edges)
        # final labels: untouched map through merged, survivors/batch
        # resolve directly (isolated -> own id)
        labels = {}
        for x, l in labelsC.items():
            if x in removed:
                continue
            labels[x] = merged.get(x, x) if l in touched else merged.get(l, l)
        for x in shN:
            labels[x] = merged.get(x, x)
        stages = {**stagesB, **stagesN}
        for x in removed:
            stages[x] = "contaminated"
        quality = {x: (stB.get(x) or stN.get(x))[2] for x in labels}
        assemble(stages, labels, quality)
    maybe("x09_curation_merge", x09)

    def x19():
        # composed curation lifecycle, honest single-process form: base
        # state on carried dicts, merge(batch1) with state-forward,
        # delete(slice — registry untouched), merge(batch2 incl. the
        # re-ingested third) — never a survivor rebuild. State: stages,
        # clean labels/shingles/quality, the pair list, the clean
        # gram index (stale entries liveness-filtered against sh), the
        # band dict (occupants liveness-filtered), the bench gram set.
        d = pd.read_parquet(P("documents"))
        m5 = d.doc_id % 5

        def build(df):
            st = doc_pass(df)
            bg = set().union(*(g for isb, _, _, g, _ in st.values() if isb),
                             set())
            stages = stages_of(st, bg)
            sh = {x: st[x][4] for x, s_ in stages.items() if s_ == "clean"}
            pairs = verified_pairs(band_table(sh), sh)
            return dict(stages=stages, labels=cc_min(list(sh), pairs),
                        sh=sh, pairs=pairs,
                        quality={x: st[x][2] for x in sh},
                        grams={x: st[x][3] for x in sh},
                        bands=band_table(sh), bg=bg)

        def merge_step(S, df):
            stN = doc_pass(df)
            bgNew = set().union(*(g for isb, _, _, g, _ in stN.values() if isb),
                                set())
            bgAll = S["bg"] | bgNew
            stagesN = stages_of(stN, bgAll)
            removed = {x for x in S["sh"]
                       if S["grams"][x] & bgNew}
            touched = {S["labels"][x] for x in removed}
            survivors = [x for x, l in S["labels"].items()
                         if l in touched and x not in removed]
            sub_edges = [(a, b) for a, b in S["pairs"]
                         if S["labels"][a] in touched
                         and a not in removed and b not in removed]
            shN = {x: stN[x][4] for x, s_ in stagesN.items() if s_ == "clean"}
            bandsN = band_table(shN)
            liveC = lambda x: x in S["sh"] and x not in removed
            cand = set()
            for key, idsN in bandsN.items():
                occ = [x for x in S["bands"].get(key, ()) if liveC(x)]
                for a in idsN:
                    for b in occ + [x for x in idsN if x != a]:
                        cand.add((min(a, b), max(a, b)))
            shAll = {**S["sh"], **shN}
            new_pairs = [(a, b) for a, b in cand
                         if round(len(shAll[a] & shAll[b])
                                  / len(shAll[a] | shAll[b]), 6) >= 0.5]
            lift = lambda x: S["labels"][x] \
                if x in S["labels"] and x not in removed \
                and S["labels"][x] not in touched else x
            edges = sub_edges + [(lift(a), lift(b)) for a, b in new_pairs]
            merged = cc_min({v for e in edges for v in e}, edges)
            labels = {}
            for x, l in S["labels"].items():
                if x in removed:
                    continue
                labels[x] = merged.get(x, x) if l in touched else merged.get(l, l)
            for x in shN:
                labels[x] = merged.get(x, x)
            stages = {**S["stages"], **stagesN}
            for x in removed:
                stages[x] = "contaminated"
            sh2 = {x: s_ for x, s_ in shAll.items() if x not in removed}
            bands2 = S["bands"]
            for key, idsN in bandsN.items():
                bands2.setdefault(key, []).extend(idsN)
            return dict(stages=stages, labels=labels, sh=sh2,
                        pairs=[(a, b) for a, b in S["pairs"]
                               if a not in removed and b not in removed]
                              + new_pairs,
                        quality={**{x: q for x, q in S["quality"].items()
                                    if x not in removed},
                                 **{x: stN[x][2] for x in shN}},
                        grams={**{x: g for x, g in S["grams"].items()
                                  if x not in removed},
                               **{x: stN[x][3] for x in shN}},
                        bands=bands2, bg=bgAll)

        def delete_step(S, dele):
            touched = {S["labels"][x] for x in dele if x in S["labels"]}
            surv = [x for x, l in S["labels"].items()
                    if l in touched and x not in dele]
            sub = [(a, b) for a, b in S["pairs"]
                   if S["labels"][a] in touched
                   and a not in dele and b not in dele]
            labels = {x: l for x, l in S["labels"].items()
                      if l not in touched and x not in dele}
            labels.update(cc_min(surv, sub))
            return dict(
                stages={x: s_ for x, s_ in S["stages"].items()
                        if x not in dele},
                labels=labels,
                sh={x: s_ for x, s_ in S["sh"].items() if x not in dele},
                pairs=[(a, b) for a, b in S["pairs"]
                       if a not in dele and b not in dele],
                quality={x: q for x, q in S["quality"].items()
                         if x not in dele},
                grams={x: g for x, g in S["grams"].items() if x not in dele},
                bands=S["bands"], bg=S["bg"])

        S = build(d[(m5 != 0) & (m5 != 1)])
        S = merge_step(S, d[m5 == 0])
        dele = {x for x, s_ in S["stages"].items()
                if x % 10 == 3 and s_ != "benchmark"
                and h60(str(x), 19) % 20 != 0}
        S = delete_step(S, dele)
        S = merge_step(S, d[(m5 == 1) |
                            ((d.doc_id % 10 == 3) & (d.doc_id % 3 == 0)
                             & (d.doc_id.map(lambda x: h60(str(x), 19) % 20 != 0)))])
        # the delete removed the lifecycle liveness of sh/labels;
        # bands keeps stale occupants — liveness is re-checked at probe
        return assemble(S["stages"], S["labels"], S["quality"])
    maybe("x19_curation_lifecycle", x19)

    def x18():
        # curation takedown, the honest single-process form of the gated
        # key: build the full decision state (x08's passes), then
        # propagate — per-doc verdicts stand (immutable benchmark
        # registry; bench rows are takedown-exempt), touched clean
        # components re-union-find, keeper re-elects by QUALITY in the
        # shared assemble.
        df = pd.read_parquet(P("documents"))
        st = doc_pass(df)
        bench_grams = set().union(
            *(g for isb, _, _, g, _ in st.values() if isb), set())
        stages = stages_of(st, bench_grams)
        sh_clean = {d_: st[d_][4] for d_, s_ in stages.items() if s_ == "clean"}
        pairs = verified_pairs(band_table(sh_clean), sh_clean)
        labels = cc_min(list(sh_clean), pairs)
        deleted = {d_ for d_ in stages
                   if d_ % 10 == 3 and not st[d_][0]}
        touched = {labels[d_] for d_ in deleted if d_ in labels}
        surv = [d_ for d_ in labels
                if labels[d_] in touched and d_ not in deleted]
        sub = [(a, b) for a, b in pairs
               if labels[a] in touched and a not in deleted and b not in deleted]
        out_labels = {d_: l for d_, l in labels.items()
                      if l not in touched}
        out_labels.update(cc_min(surv, sub))
        quality = {d_: st[d_][2] for d_ in out_labels}
        stages2 = {d_: s_ for d_, s_ in stages.items() if d_ not in deleted}
        return assemble(stages2, out_labels, quality)
    maybe("x18_curation_delete", x18)

    def d16():
        # takedown through dup groups, the honest single-process form of
        # the gated key: build the full labelling + pair graph (state),
        # then propagate — untouched components pass through, touched
        # components' survivors re-union-find on their induced subgraph
        # (keeper re-election and splits fall out of the re-CC).
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        sh_map = {}
        for did, t in zip(d.doc_id, d.text):
            toks = re.split(r"\s+", t)
            sh_map[did] = {" ".join(toks[i:i + 3])
                           for i in range(len(toks) - 2)} \
                if len(toks) >= 3 else set()
        ids = list(d.doc_id)
        pairs = verified_pairs(band_table(sh_map), sh_map)
        labels = cc_min(ids, pairs)
        deleted = {i for i in ids if i % 10 == 3}
        touched = {labels[i] for i in deleted}
        surv = [i for i in ids if labels[i] in touched and i not in deleted]
        sub = [(a, b) for a, b in pairs
               if labels[a] in touched and a not in deleted and b not in deleted]
        out = {i: labels[i] for i in ids
               if labels[i] not in touched}
        out.update(cc_min(surv, sub))
        sizes = Counter(out.values())
        return pd.DataFrame(
            [(i, l, sizes[l], i == l) for i, l in out.items()],
            columns=["doc_id", "canonical_id", "group_size", "is_keeper"])
    maybe("d16_delete_groups", d16)

    def d17():
        # composed lifecycle (append -> delete -> append), the honest
        # single-process form: base state (bands + verified pairs +
        # union-find labels over the 60% base corpus), then THREE
        # incremental operations on carried dicts — batch1 band-probes
        # the state, the takedown drops vertices/edges with touched-
        # component re-union-find, batch2 (incl. re-ingested ids)
        # band-probes the post-delete state. Never a from-scratch
        # rebuild of the survivor corpus — the same work shape the
        # Spark side runs.
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        sh_all = {}
        for did, t in zip(d.doc_id, d.text):
            toks = re.split(r"\s+", t)
            sh_all[did] = {" ".join(toks[i:i + 3])
                           for i in range(len(toks) - 2)} \
                if len(toks) >= 3 else set()
        ids = [int(i) for i in d.doc_id]
        base = [i for i in ids if i % 5 not in (0, 1)]
        batch1 = [i for i in ids if i % 5 == 0]
        deleted = {i for i in ids if i % 10 == 3}
        batch2 = [i for i in ids
                  if i % 5 == 1 or (i % 10 == 3 and i % 3 == 0)]
        # Base state.
        sh = {i: sh_all[i] for i in base if sh_all[i]}
        pairs = verified_pairs(band_table(sh), sh)
        labels = cc_min(base, pairs)

        def append(labels, pairs, sh, members, new_ids):
            new_sh = {i: sh_all[i] for i in new_ids if sh_all[i]}
            merged_sh = {**sh, **new_sh}
            bt = band_table(merged_sh)
            new_set = set(new_ids)
            # candidates touching the batch only (the band-probe bound)
            cand = set()
            for occ in bt.values():
                occ = sorted(set(occ))
                for x in range(len(occ)):
                    for y in range(x + 1, len(occ)):
                        if occ[x] in new_set or occ[y] in new_set:
                            cand.add((occ[x], occ[y]))
            new_pairs = [(a, b) for a, b in cand
                         if round(len(merged_sh[a] & merged_sh[b])
                                  / len(merged_sh[a] | merged_sh[b]), 6) >= 0.5]
            all_members = members + list(new_ids)
            # label-space merge: old endpoints stand for their component
            lifted = [(labels.get(a, a), labels.get(b, b))
                      for a, b in new_pairs]
            sub = cc_min(list({v for e in lifted for v in e}), lifted)
            out = {i: sub.get(l, l) for i, l in labels.items()}
            out.update({i: sub.get(i, i) for i in new_ids})
            return out, pairs + new_pairs, merged_sh, all_members

        def delete(labels, pairs, sh, members, dele):
            touched = {labels[i] for i in dele if i in labels}
            surv = [i for i in members
                    if labels[i] in touched and i not in dele]
            sub = [(a, b) for a, b in pairs
                   if labels[a] in touched and a not in dele and b not in dele]
            out = {i: l for i, l in labels.items()
                   if l not in touched and i not in dele}
            out.update(cc_min(surv, sub))
            return (out,
                    [(a, b) for a, b in pairs
                     if a not in dele and b not in dele],
                    {i: s_ for i, s_ in sh.items() if i not in dele},
                    [i for i in members if i not in dele])

        st = (labels, pairs, sh, list(base))
        st = append(*st, batch1)
        st = delete(*st, deleted)
        st = append(*st, batch2)
        out = st[0]
        sizes = Counter(out.values())
        return pd.DataFrame(
            [(i, l, sizes[l], i == l) for i, l in out.items()],
            columns=["doc_id", "canonical_id", "group_size", "is_keeper"])
    maybe("d17_lifecycle_groups", d17)

    # s10 (takedowns on a CDC stream) has no streaming runtime in a
    # single-process baseline — its honest batch form IS d16's (the
    # stream-key convention: s06 shares s02's, s01/s09 share one form);
    # the drained per-batch deletes compose to the same one-shot result.
    maybe("s10_stream_takedown", d16)

    # ---- round-13 additions: the round-12 keys' faithful single-node
    # forms (s06 shares s02's sessionization baseline; the stream keys'
    # baselines are the equivalent BATCH computation, since pandas has no
    # streaming runtime — same output, no micro-batch machinery) ----

    def s07():
        # stream-stream join == the batch window join: per-user sorted
        # purchase arrays + searchsorted windows (the merge-then-filter
        # form materializes the user-level cross product and OOMs at
        # sf10's replicated users; a competent single-node engineer
        # writes this form)
        ev = pd.read_parquet(P("events"))
        us = ts_micros(ev.ts)
        w = int(4 * int(us.max() - us.min()) * ev.user_id.nunique() // len(ev))
        v = pd.DataFrame({"u": ev.user_id[ev.event_type == "view"],
                          "us": us[ev.event_type == "view"],
                          "id": ev.event_id[ev.event_type == "view"]})
        p = pd.DataFrame({"u": ev.user_id[ev.event_type == "purchase"],
                          "us": us[ev.event_type == "purchase"],
                          "id": ev.event_id[ev.event_type == "purchase"]}
                         ).sort_values(["u", "us", "id"])
        pg = {u: (g.us.to_numpy(), g.id.to_numpy()) for u, g in p.groupby("u")}
        out_v, out_p, out_lag = [], [], []
        for u, g in v.groupby("u"):
            if u not in pg:
                continue
            pus, pid = pg[u]
            vus = g.us.to_numpy(); vid = g.id.to_numpy()
            lo = np.searchsorted(pus, vus, side="left")
            hi = np.searchsorted(pus, vus + w, side="right")
            n = hi - lo
            keep = n > 0
            if not keep.any():
                continue
            idx = np.concatenate([np.arange(a, b) for a, b in
                                  zip(lo[keep], hi[keep])])
            out_v.append(np.repeat(vid[keep], n[keep]))
            out_p.append(pid[idx])
            out_lag.append(pus[idx] - np.repeat(vus[keep], n[keep]))
        pd.DataFrame({"view_id": np.concatenate(out_v),
                      "purchase_id": np.concatenate(out_p),
                      "lag_us": np.concatenate(out_lag)})
    maybe("s07_stream_join", s07)

    def m04():
        # ISO-BMFF: synthesize the byte-exact MP4 container per row, then
        # a generic box walk back (per-row Python, like m01's baseline)
        import struct
        d = pd.read_parquet(P("documents"))
        H = bytes.fromhex
        MATRIX = ("00010000" + "00000000" + "00000000" +
                  "00000000" + "00010000" + "00000000" +
                  "00000000" + "00000000" + "40000000")
        FTYP = H("000000186674797069736F6D0000020069736F6D69736F32")
        def build(row):
            did, nch = int(row.doc_id), int(row.n_chars)
            tsc = 600 * (1 + did % 4); dur = 600 + (nch * 37) % 72000
            pad = 4 + did % 32; w = 128 + did % 1792; h = 96 + nch % 984
            mvhd = (H("0000006C6D766864" + "00" * 12) +
                    struct.pack(">II", tsc, dur) +
                    H("000100000100" + "0000" + "00" * 8 + MATRIX +
                      "00" * 24 + "00000002"))
            tkhd = (H("0000005C746B686400000007" + "00" * 8 +
                      "0000000100000000") + struct.pack(">I", dur) +
                    H("00" * 8 + "0000" * 4 + MATRIX) +
                    struct.pack(">II", w << 16, h << 16))
            mdhd = (H("000000206D646864" + "00" * 12) +
                    struct.pack(">II", tsc, dur) + H("55C40000"))
            hdlr = H("0000002168646C72000000000000000076696465" +
                     "00" * 12 + "00")
            entry = (struct.pack(">I", 0x56) +
                     (b"avc1" if did % 2 == 0 else b"hvc1") +
                     H("000000000000" + "0001" + "0000" + "0000" + "00" * 12) +
                     struct.pack(">HH", w, h) +
                     H("004800000048000000000000" + "0001" + "00" * 32 +
                       "0018FFFF"))
            stsd = H("000000667374736400000000" + "00000001") + entry
            stbl = H("0000006E7374626C") + stsd
            minf = H("000000766D696E66") + stbl
            mdia = H("000000BF6D646961") + mdhd + hdlr + minf
            trak = H("000001237472616B") + tkhd + mdia
            moov = H("000001976D6F6F76") + mvhd + trak
            mdat = struct.pack(">I", 8 + pad) + b"mdat" + b"A" * pad
            return FTYP + moov + mdat
        CONT = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
        def walk(b):
            ts = du = w = h = 0; codec = "unknown"
            stack = [(0, len(b))]
            while stack:
                i, to = stack.pop()
                while i + 8 <= to:
                    size = struct.unpack(">I", b[i:i+4])[0]
                    typ = b[i+4:i+8]
                    if size < 8 or i + size > to:
                        break
                    if typ in CONT:
                        stack.append((i + 8, i + size))
                    elif typ == b"mvhd":
                        ts, du = struct.unpack(">II", b[i+20:i+28])
                    elif typ == b"stsd" and codec == "unknown":
                        e_ = i + 16
                        codec = b[e_+4:e_+8].decode()
                        w, h = struct.unpack(">HH", b[e_+32:e_+36])
                    i += size
            return (w, h, codec, du * 1000 // ts if ts else 0)
        d.apply(build, axis=1).map(walk)
    maybe("m04_video_meta", m04)

    def m05():
        # content-addressed media dedup: synthesize the reduced-key
        # payloads, md5-digest, group by (digest, length)
        import struct
        d = pd.read_parquet(P("documents"))
        H = bytes.fromhex
        mmod = max(1, len(d) // 2)
        PNG_PRE = H("89504E470D0A1A0A0000000D49484452")
        PNG_POST = H("0806000000AA5500FF")
        PNG_END = H("0000000049454E44AA5500FF")
        JPG_PRE = H("FFD8FFE000104A46494600010100000100010000")
        def build(did):
            ck = did % mmod
            w = 64 + ck % 1920; h = 64 + ck % 1080
            segs = [(ck * 4096 + k) for k in range(1, 5)]
            if ck % 2 == 0:
                return (PNG_PRE + struct.pack(">II", w, h) + PNG_POST +
                        b"".join(H("0000000874455874") + struct.pack(">Q", v) +
                                 H("AA5500FF") for v in segs) + PNG_END)
            return (JPG_PRE +
                    b"".join(H("FFFE000A") + struct.pack(">Q", v)
                             for v in segs) +
                    H("FFC0001108") + struct.pack(">HH", h, w) +
                    H("03012200021101031101") +
                    H("FFDA000C03010002110311003F00") + H("FFD9"))
        pl = d.doc_id.map(build)
        dig = pl.map(lambda b: hashlib.md5(b).hexdigest())
        pd.DataFrame({"dig": dig, "n": pl.map(len), "doc_id": d.doc_id}) \
            .groupby(["dig", "n"]).agg(keep_id=("doc_id", "min"),
                                       n_copies=("doc_id", "size"))
    maybe("m05_media_dedup", m05)

    def m06():
        # near-dup media by shared metadata segments: the features below
        # are exactly the parsed 8-byte segment contents of the base +
        # tampered-variant payloads (m05 synthesizes the same bytes);
        # inverted index on (ordinal, marker, value), pair count, >= 3.
        from collections import defaultdict, Counter
        d = pd.read_parquet(P("documents"), columns=["doc_id"])
        ids = d.doc_id.astype("int64").to_numpy()
        shift = int(ids.max()) + 1
        idx = defaultdict(list)
        def feats(src, tamper):
            marker = "tEXt" if src % 2 == 0 else "COM"
            return [(k, marker, src * 4096 + k + (1 if k > 4 - tamper else 0))
                    for k in range(1, 5)]
        for src in ids:
            src = int(src)
            for f in feats(src, 0):
                idx[f].append(src)
            for f in feats(src, 1 + src % 2):
                idx[f].append(src + shift)
        pairs = Counter()
        for f, ms in idx.items():
            if len(ms) > 1:
                ms.sort()
                for i in range(len(ms)):
                    for j in range(i + 1, len(ms)):
                        pairs[(ms[i], ms[j])] += 1
        rows = [(a, b, n) for (a, b), n in pairs.items() if n >= 3]
        return pd.DataFrame(sorted(rows), columns=["id_a", "id_b", "n_shared"])
    maybe("m06_media_neardup", m06)

    def e08():
        # filtered ANN == brute-force cosine over the lang='en' candidate
        # set (numpy/BLAS form, e01's shape after the predicate)
        e = pd.read_parquet(P("embeddings"))
        docs = pd.read_parquet(P("documents"))
        allowed = set(docs.doc_id[docs.lang == "en"])
        V = np.stack(e.embedding.to_numpy()).astype(np.float64)
        ids = e.vec_id.to_numpy()
        amask = np.isin(ids, list(allowed))
        C = V[amask]
        Q = V[ids % 100 == 0]
        sims = (Q @ C.T) / (np.linalg.norm(Q, axis=1)[:, None] *
                            np.linalg.norm(C, axis=1)[None, :])
        np.argsort(-np.round(sims, 6), axis=1)[:, :11]
    maybe("e08_filtered_ann", e08)

    def m07():
        # perceptual near-dup, single-node form: synthesize each doc's
        # grayscale PNG (zlib, real CRCs), decode it back (zlib +
        # unfilter), aHash over the 8x8 integer block grid, 4x16-bit
        # band buckets, pairs at hamming <= 3 — the same byte-real
        # encode/decode work the Spark plan distributes
        import zlib, struct
        d = pd.read_parquet(P("documents"), columns=["doc_id"])
        h60 = lambda seed, s: int(
            hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

        def pixels(doc):
            b = doc - 1 if doc > 0 and (doc % 17 == 0 or doc % 31 == 0) else doc
            edited = doc > 0 and doc % 17 != 0 and doc % 31 == 0
            w, h = 8 + b % 9, 8 + (b * 7) % 9
            px = []
            for y in range(h):
                r = h60(47, f"{b}:{y}")
                row = [(r >> (8 * (x % 7))) & 255 for x in range(w)]
                if edited:
                    row = [min(p + 3, 255) for p in row]
                px.append(row)
            return w, h, px

        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data +
                    struct.pack(">I", zlib.crc32(typ + data)))

        def encode(doc):
            w, h, px = pixels(doc)
            ft = 1 if doc > 0 and doc % 17 == 0 else 0
            raw = bytearray()
            prev = [0] * w
            for y in range(h):
                raw.append(ft)
                cur = px[y]
                for x in range(w):
                    pred = (cur[x - 1] if x > 0 else 0) if ft == 1 else 0
                    raw.append((cur[x] - pred) & 0xff)
                prev = cur
            ihdr = struct.pack(">II", w, h) + bytes([8, 0, 0, 0, 0])
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
                    chunk(b"tEXt", b"Comment\x00" + f"m07 doc {doc}".encode()) +
                    chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

        def decode(b):
            assert b[:8] == b"\x89PNG\r\n\x1a\n"
            i, w, h, idat = 8, 0, 0, b""
            while i + 12 <= len(b):
                ln = struct.unpack(">I", b[i:i+4])[0]
                typ = b[i+4:i+8]
                assert zlib.crc32(b[i+4:i+8+ln]) == struct.unpack(
                    ">I", b[i+8+ln:i+12+ln])[0]
                if typ == b"IHDR":
                    w, h = struct.unpack(">II", b[i+8:i+16])
                elif typ == b"IDAT":
                    idat += b[i+8:i+8+ln]
                i += 12 + ln
            raw = zlib.decompress(idat)
            px = [[0] * w for _ in range(h)]
            for y in range(h):
                ft = raw[y * (w + 1)]
                for x in range(w):
                    f = raw[y * (w + 1) + 1 + x]
                    a = px[y][x-1] if x > 0 else 0
                    up = px[y-1][x] if y > 0 else 0
                    c = px[y-1][x-1] if x > 0 and y > 0 else 0
                    if ft == 0: pred = 0
                    elif ft == 1: pred = a
                    elif ft == 2: pred = up
                    elif ft == 3: pred = (a + up) // 2
                    else:
                        p = a + up - c
                        pa, pb, pc = abs(p-a), abs(p-up), abs(p-c)
                        pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
                    px[y][x] = (f + pred) & 0xff
            return w, h, px

        def ahash(w, h, px):
            bs = [0]*64; nb = [0]*64; total = 0
            for y in range(h):
                for x in range(w):
                    bi = (y*8//h)*8 + x*8//w
                    bs[bi] += px[y][x]; nb[bi] += 1; total += px[y][x]
            n = w * h
            v = sum(1 << i for i in range(64) if bs[i]*n > total*nb[i])
            return v - (1 << 64) if v >= (1 << 63) else v

        fps = {}
        for doc in d.doc_id.astype("int64"):
            fps[int(doc)] = ahash(*decode(encode(int(doc))))
        buckets = {}
        for doc, fp in fps.items():
            for band in range(4):
                buckets.setdefault((band, (fp >> (16*band)) & 0xffff),
                                   []).append(doc)
        rows = set()
        for ids in buckets.values():
            ids.sort()
            for i in range(len(ids)):
                for j in range(i+1, len(ids)):
                    a, b = ids[i], ids[j]
                    hd = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
                    if hd <= 3:
                        rows.add((a, b, hd))
        return pd.DataFrame(sorted(rows), columns=["id_a", "id_b", "hamming"])
    maybe("m07_perceptual_dedup", m07)

    def m08():
        # perceptual groups: m07's full pipeline + union-find with the
        # min-id canonical convention
        pairs_df = m07()
        d = pd.read_parquet(P("documents"), columns=["doc_id"])
        parent = {}
        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r
        for a, b in zip(pairs_df.id_a, pairs_df.id_b):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        rows = []
        ids = [int(x) for x in d.doc_id]
        canon = {i: find(i) for i in ids}
        from collections import Counter
        sizes = Counter(canon.values())
        for i in ids:
            c = canon[i]
            rows.append((i, c, sizes[c], i == c))
        return pd.DataFrame(rows, columns=["doc_id", "canonical_id",
                                           "group_size", "is_keeper"])
    maybe("m08_media_groups", m08)

    def m09():
        # perceptual audio near-dup, single-node form: synthesize each
        # doc's REAL PCM WAV (the m09 sample grammar; re-encode plants
        # stored 16-bit = samples x256, gain edits rail-saturated +/-5),
        # read it back through the stdlib `wave` codec (an independent
        # parser — the javax.sound cross-check's python sibling),
        # frame-energy hash over 64 time frames (strict integer
        # cross-multiply), 4x16-bit band buckets, pairs at hamming <= 3.
        import wave, io, struct
        d = pd.read_parquet(P("documents"), columns=["doc_id"])
        h60 = lambda seed, s: int(
            hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

        def samples(doc):
            b = doc - 1 if doc > 0 and (doc % 19 == 0 or doc % 29 == 0) else doc
            edited = doc > 0 and doc % 19 != 0 and doc % 29 == 0
            n = 64 + (b * 5) % 97
            out = []
            for i in range(n):
                if i % 7 == 0:
                    r = h60(59, f"{b}:{i // 7}")
                s = ((r >> (8 * (i % 7))) & 255) - 128
                if edited:
                    s = min(s + 5, 127) if s >= 0 else max(s - 5, -128)
                out.append(s)
            return out

        def encode(doc):
            s = samples(doc)
            bits = 16 if doc > 0 and doc % 19 == 0 else 8
            buf = io.BytesIO()
            w = wave.open(buf, "wb")
            w.setnchannels(1); w.setsampwidth(bits // 8); w.setframerate(8000)
            if bits == 8:
                w.writeframes(bytes(v + 128 for v in s))
            else:
                w.writeframes(b"".join(struct.pack("<h", v * 256) for v in s))
            w.close()
            return buf.getvalue()

        def decode(b):
            w = wave.open(io.BytesIO(b), "rb")
            assert w.getnchannels() == 1
            raw = w.readframes(w.getnframes())
            if w.getsampwidth() == 1:
                return [v - 128 for v in raw]
            return list(np.frombuffer(raw, dtype="<i2").astype(int))

        def fhash(s):
            n = len(s)
            fs = [0] * 64; nf = [0] * 64; total = 0
            for i, v in enumerate(s):
                f = 64 * i // n
                a = abs(v)
                fs[f] += a; nf[f] += 1; total += a
            v = sum(1 << f for f in range(64) if fs[f] * n > total * nf[f])
            return v - (1 << 64) if v >= (1 << 63) else v

        fps = {int(doc): fhash(decode(encode(int(doc))))
               for doc in d.doc_id.astype("int64")}
        buckets = {}
        for doc, fp in fps.items():
            for band in range(4):
                buckets.setdefault((band, (fp >> (16 * band)) & 0xffff),
                                   []).append(doc)
        rows = set()
        for ids in buckets.values():
            ids.sort()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a, b = ids[i], ids[j]
                    hd = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
                    if hd <= 3:
                        rows.add((a, b, hd))
        return pd.DataFrame(sorted(rows), columns=["id_a", "id_b", "hamming"])
    maybe("m09_audio_dedup", m09)

    def m12():
        # audio trak through the sample tables, single-node form: build
        # each doc's AV MP4 (one PNG frame under the m11 pixel grammar +
        # the m09 PCM grammar in a 'raw '/'sowt' audio trak with UNIFORM
        # stsz), walk the boxes PER TRAK (hdlr scopes the tables), pull
        # the audio bytes via stsz/stco, then m09's hash + band tail.
        import struct, zlib
        d = pd.read_parquet(P("documents"), columns=["doc_id"])
        h60 = lambda seed, s: int(
            hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

        def samples(doc):
            b = doc - 1 if doc > 0 and (doc % 19 == 0 or doc % 29 == 0) else doc
            edited = doc > 0 and doc % 19 != 0 and doc % 29 == 0
            n = 64 + (b * 5) % 97
            out = []
            for i in range(n):
                if i % 7 == 0:
                    r = h60(59, f"{b}:{i // 7}")
                s = ((r >> (8 * (i % 7))) & 255) - 128
                if edited:
                    s = min(s + 5, 127) if s >= 0 else max(s - 5, -128)
                out.append(s)
            return out

        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data +
                    struct.pack(">I", zlib.crc32(typ + data)))

        def png_frame(doc):
            w, h = 8 + doc % 9, 8 + (doc * 5) % 9
            raw = bytearray()
            for y in range(h):
                r = h60(67, f"{doc}:0:{y}")
                raw.append(0)
                raw.extend((r >> (8 * (x % 7))) & 255 for x in range(w))
            ihdr = struct.pack(">II", w, h) + bytes([8, 0, 0, 0, 0])
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
                    chunk(b"IDAT", zlib.compress(bytes(raw))) +
                    chunk(b"IEND", b""))

        def box(typ, payload):
            return struct.pack(">I", 8 + len(payload)) + typ + payload

        def mp4av(frame, bits, smp):
            ab = bytes(v + 128 for v in smp) if bits == 8 else \
                b"".join(struct.pack("<h", v * 256) for v in smp)
            vhdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide" + bytes(13))
            vstsz = box(b"stsz", struct.pack(">III", 0, 0, 1) +
                        struct.pack(">I", len(frame)))
            ahdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"soun" + bytes(13))
            astsd = box(b"stsd", struct.pack(">II", 0, 1) +
                        struct.pack(">I", 36) +
                        (b"raw " if bits == 8 else b"sowt") + bytes(16) +
                        struct.pack(">HH", 1, bits) + bytes(4) +
                        struct.pack(">I", 8000 << 16))
            astsz = box(b"stsz", struct.pack(">III", 0, bits // 8, len(smp)))
            def assemble(off):
                vstco = box(b"stco", struct.pack(">III", 0, 1, off))
                astco = box(b"stco", struct.pack(">III", 0, 1, off + len(frame)))
                vtrak = box(b"trak", vhdlr + box(b"stbl", vstsz + vstco))
                atrak = box(b"trak", ahdlr + box(b"stbl", astsd + astsz + astco))
                moov = box(b"moov", vtrak + atrak)
                return (b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2" +
                        moov + box(b"mdat", frame + ab))
            probe = assemble(0)
            return assemble(len(probe) - len(frame) - len(ab))

        def audio_of(b_):
            traks = []
            def walk(i, end, cur):
                while i + 8 <= end:
                    size = struct.unpack(">I", b_[i:i + 4])[0]
                    typ = b_[i + 4:i + 8]
                    if typ == b"trak":
                        cur = {}
                        traks.append(cur)
                        walk(i + 8, i + size, cur)
                    elif typ in (b"moov", b"stbl"):
                        walk(i + 8, i + size, cur)
                    elif typ == b"hdlr" and cur is not None:
                        cur["h"] = b_[i + 16:i + 20]
                    elif typ == b"stsd" and cur is not None:
                        cur["fmt"] = b_[i + 20:i + 24]
                    elif typ == b"stsz" and cur is not None:
                        cur["usz"], cur["n"] = struct.unpack(
                            ">II", b_[i + 12:i + 20])
                    elif typ == b"stco" and cur is not None:
                        cur["off"] = struct.unpack(">I", b_[i + 16:i + 20])[0]
                    i += size
            walk(0, len(b_), None)
            a = next(t for t in traks if t.get("h") == b"soun")
            raw = b_[a["off"]:a["off"] + a["n"] * a["usz"]]
            if a["fmt"] == b"raw ":
                return [v - 128 for v in raw]
            return list(np.frombuffer(raw, dtype="<i2").astype(int))

        def fhash(s):
            n = len(s)
            fs = [0] * 64; nf = [0] * 64; total = 0
            for i, v in enumerate(s):
                f = 64 * i // n
                a = abs(v)
                fs[f] += a; nf[f] += 1; total += a
            v = sum(1 << f for f in range(64) if fs[f] * n > total * nf[f])
            return v - (1 << 64) if v >= (1 << 63) else v

        fps = {}
        for doc in d.doc_id.astype("int64"):
            doc = int(doc)
            bits = 16 if doc > 0 and doc % 19 == 0 else 8
            av = mp4av(png_frame(doc), bits, samples(doc))
            fps[doc] = fhash(audio_of(av))
        buckets = {}
        for doc, fp in fps.items():
            for band in range(4):
                buckets.setdefault((band, (fp >> (16 * band)) & 0xffff),
                                   []).append(doc)
        rows = set()
        for ids in buckets.values():
            ids.sort()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a, b = ids[i], ids[j]
                    hd = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
                    if hd <= 3:
                        rows.add((a, b, hd))
        return pd.DataFrame(sorted(rows), columns=["id_a", "id_b", "hamming"])
    maybe("m12_mp4_audio", m12)

    def m11():
        # perceptual video near-dup, single-node form: build each doc's
        # MP4 (real PNG frames + stsz/stco sample tables), read the
        # frames BACK via the tables, aHash per frame, pairs by shared
        # hashes over a df-capped inverted index.
        import zlib, struct
        d = pd.read_parquet(P("documents"), columns=["doc_id"])
        h60 = lambda seed, s: int(
            hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

        def fpixels(b, f):
            w, h = 8 + b % 9, 8 + (b * 5) % 9
            px = []
            for y in range(h):
                r = h60(67, f"{b}:{f}:{y}")
                px.append([(r >> (8 * (x % 7))) & 255 for x in range(w)])
            return w, h, px

        def chunk(typ, data):
            return (struct.pack(">I", len(data)) + typ + data +
                    struct.pack(">I", zlib.crc32(typ + data)))

        def png(w, h, px, ft, meta):
            raw = bytearray()
            for y in range(h):
                raw.append(ft)
                cur = px[y]
                for x in range(w):
                    pred = (cur[x - 1] if x > 0 else 0) if ft == 1 else 0
                    raw.append((cur[x] - pred) & 0xff)
            ihdr = struct.pack(">II", w, h) + bytes([8, 0, 0, 0, 0])
            return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
                    chunk(b"tEXt", b"Comment\x00" + meta.encode()) +
                    chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

        def box(typ, payload):
            return struct.pack(">I", 8 + len(payload)) + typ + payload

        def mp4(frames):
            n = len(frames)
            stsz = box(b"stsz", struct.pack(">III", 0, 0, n) +
                       b"".join(struct.pack(">I", len(f)) for f in frames))
            def assemble(off):
                stco = box(b"stco", struct.pack(">III", 0, 1, off))
                stbl = box(b"stbl", stsz + stco)
                moov = box(b"moov", stbl)
                mdat = box(b"mdat", b"".join(frames))
                return b"\x00\x00\x00\x18ftypisom\x00\x00\x02\x00isomiso2" + moov + mdat
            probe = assemble(0)
            return assemble(len(probe) - sum(len(f) for f in frames))

        def frames_of(b_):
            i, sizes, off = 12, None, None
            # (the python builder writes a minimal but table-correct moov)
            def walk(i, end):
                nonlocal sizes, off
                while i + 8 <= end:
                    size = struct.unpack(">I", b_[i:i+4])[0]
                    typ = b_[i+4:i+8]
                    if typ in (b"moov", b"stbl"):
                        walk(i + 8, i + size)
                    elif typ == b"stsz":
                        n = struct.unpack(">I", b_[i+16:i+20])[0]
                        sizes = [struct.unpack(">I", b_[i+20+4*k:i+24+4*k])[0]
                                 for k in range(n)]
                    elif typ == b"stco":
                        off = struct.unpack(">I", b_[i+16:i+20])[0]
                    i += size
            walk(0, len(b_))
            out, o = [], off
            for s_ in sizes:
                out.append(b_[o:o+s_]); o += s_
            return out

        def decode(b_):
            i, w, h, idat = 8, 0, 0, b""
            while i + 12 <= len(b_):
                ln = struct.unpack(">I", b_[i:i+4])[0]
                typ = b_[i+4:i+8]
                if typ == b"IHDR":
                    w, h = struct.unpack(">II", b_[i+8:i+16])
                elif typ == b"IDAT":
                    idat += b_[i+8:i+8+ln]
                i += 12 + ln
            raw = zlib.decompress(idat)
            px = [[0] * w for _ in range(h)]
            for y in range(h):
                ft = raw[y * (w + 1)]
                for x in range(w):
                    fv = raw[y * (w + 1) + 1 + x]
                    a = px[y][x-1] if x > 0 else 0
                    px[y][x] = (fv + (a if ft == 1 else 0)) & 0xff
            return w, h, px

        def ahash(w, h, px):
            bs = [0]*64; nb = [0]*64; total = 0
            for y in range(h):
                for x in range(w):
                    bi = (y*8//h)*8 + x*8//w
                    bs[bi] += px[y][x]; nb[bi] += 1; total += px[y][x]
            n = w * h
            v = sum(1 << i for i in range(64) if bs[i]*n > total*nb[i])
            return v - (1 << 64) if v >= (1 << 63) else v

        vf = {}
        for doc in d.doc_id.astype("int64"):
            doc = int(doc)
            b = doc - 1 if doc > 0 and (doc % 23 == 0 or doc % 37 == 0) else doc
            ft = 1 if doc > 0 and doc % 23 == 0 else 0
            trim = doc > 0 and doc % 23 != 0 and doc % 37 == 0
            nf = 3 + b % 3
            fr = [png(*fpixels(b, f), ft, f"m11 doc {doc} f{f}")
                  for f in range(1 if trim else 0, nf)]
            vf[doc] = {ahash(*decode(f)) for f in frames_of(mp4(fr))}
        from collections import Counter as _C
        dfc = _C(h for hs in vf.values() for h in hs)
        inv = {}
        for doc, hs in vf.items():
            for h_ in hs:
                if dfc[h_] <= 64:
                    inv.setdefault(h_, []).append(doc)
        shared = _C()
        for ids in inv.values():
            ids.sort()
            for i in range(len(ids)):
                for j in range(i+1, len(ids)):
                    shared[(ids[i], ids[j])] += 1
        rows = [(a, b, n, len(vf[a]), len(vf[b]))
                for (a, b), n in shared.items() if n >= 2]
        return pd.DataFrame(sorted(rows),
                            columns=["id_a", "id_b", "n_shared", "n_a", "n_b"])
    maybe("m11_video_neardup", m11)

    def _m09_pairs():
        return m09()

    def m10():
        # audio groups: m09's full pipeline + min-id union-find (m08's
        # tail over the audio pair graph)
        pairs_df = _m09_pairs()
        d = pd.read_parquet(P("documents"), columns=["doc_id"])
        parent = {}
        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r
        for a, b in zip(pairs_df.id_a, pairs_df.id_b):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        ids = d.doc_id.astype("int64")
        lab = {int(i): find(int(i)) for i in ids}
        from collections import Counter as _C
        sizes = _C(lab.values())
        return pd.DataFrame(
            [(i, l, sizes[l], i == l) for i, l in lab.items()],
            columns=["doc_id", "canonical_id", "group_size", "is_keeper"])
    maybe("m10_audio_groups", m10)


    def t09():
        # HTML extraction: build the page per row, strip with the same
        # regex/replace rules (per-row Python re, the pandas idiom)
        d = pd.read_parquet(P("documents"))
        BLOCKS = [r"(?s)<script[^>]*>.*?</script>", r"(?s)<style[^>]*>.*?</style>",
                  r"(?s)<nav[^>]*>.*?</nav>", r"(?s)<aside[^>]*>.*?</aside>",
                  r"(?s)<footer[^>]*>.*?</footer>", r"(?s)<!--.*?-->"]
        ENTS = [("&nbsp;", " "), ("&mdash;", "—"), ("&copy;", "©"),
                ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                ("&#39;", "'"), ("&amp;", "&")]
        def build(row):
            did, text = str(row.doc_id), row.text
            h1, h2 = text[:len(text)//2], text[len(text)//2:]
            nxt = str(row.doc_id + 1)
            return (f'<!DOCTYPE html>\n<html lang="{row.lang}">\n<head>\n'
                    f'<title>Doc {did} &mdash; {row.source}</title>\n'
                    '<style>body { font-size: 14px; color: #222; }</style>\n'
                    f'<script type="text/javascript">var docId = {did}; '
                    'if (docId > 0 && docId % 2 == 0) { console.log("even < odd"); }</script>\n'
                    '</head>\n<body>\n'
                    f'<nav class="top"><a href="/">Home</a> &gt; '
                    f'<a href="/{row.source}">{row.source}</a></nav>\n'
                    f'<header><h1>Document {did}</h1></header>\n'
                    f'<!-- synthetic page: doc {did} lang {row.lang} -->\n'
                    '<div id="main" class="content">\n'
                    f'<p>{h1}</p>\n<p>{h2} &amp; more&nbsp;text</p>\n</div>\n'
                    f'<aside>Related: <a href="/doc/{nxt}">doc {nxt}</a></aside>\n'
                    f'<footer>&copy; {row.source} contributors</footer>\n'
                    '</body>\n</html>')
        def strip(raw):
            db = raw
            nb = 0
            for pat in BLOCKS:
                nb += len(re.findall(pat, db))
                db = re.sub(pat, " ", db)
            nt = len(re.findall(r"<[^>]*>", db))
            dt = re.sub(r"<[^>]*>", " ", db)
            ne = len(re.findall(r"&(nbsp|mdash|copy|lt|gt|quot|#39|amp);", dt))
            for e_, v_ in ENTS:
                dt = dt.replace(e_, v_)
            clean = re.sub(r"[ \t\n\r]+", " ", dt).strip()
            return (nb, nt, ne, len(raw), len(clean),
                    round(len(clean) / len(raw), 6), clean)
        d.apply(build, axis=1).map(strip)
    maybe("t09_html_extract", t09)

    def d13():
        # URL canonicalization + groupby dedup, per-row Python re (the
        # pandas idiom for string munging)
        d = pd.read_parquet(P("documents"))
        def build(did):
            cid = did // 4
            return ["https://www.example.com/articles/%d" % cid,
                    "HTTPS://WWW.Example.COM:443/articles/%d#section-2" % cid,
                    "https://www.example.com/articles/%d?utm_source=feed&utm_campaign=x" % cid,
                    "https://www.example.com/articles/%d/?ref=home" % cid][did % 4]
        def canon(u):
            m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", u)
            scheme, hostport, rest = m.group(1).lower(), m.group(2).lower(), m.group(3)
            host = re.sub(r":(80|443)$", "", hostport)
            x = re.sub(r"#.*$", "", rest)
            x = re.sub(r"(utm_[a-z]+|ref)=[^&#]*", "", x)
            x = x.replace("?&", "?").replace("&&", "&")
            x = re.sub(r"[?&]+$", "", x)
            x = re.sub(r"/+$", "", x)
            return scheme + "://" + host + x
        urls = d.doc_id.map(build)
        pd.DataFrame({"c": urls.map(canon), "u": urls, "doc_id": d.doc_id}) \
            .groupby("c").agg(keep_id=("doc_id", "min"),
                              n_spellings=("doc_id", "size"),
                              n_distinct_raw=("u", "nunique"))
    maybe("d13_url_dedup", d13)

    def x10():
        # overlapping fixed-window chunking + md5 per chunk slice
        d = pd.read_parquet(P("documents"))
        C, S = 32, 24
        rows = []
        for did, text in zip(d.doc_id, d.text):
            toks = re.split(r"\s+", text)
            n = len(toks)
            k = 1 if n <= C else (n - C + S - 1) // S + 1
            for c in range(k):
                sl = toks[c * S:c * S + C]
                rows.append((did, c, c * S, len(sl),
                             hashlib.md5(" ".join(sl).encode()).hexdigest()))
        pd.DataFrame(rows, columns=["doc_id", "chunk_no", "start_tok",
                                    "n_chunk_tokens", "chunk_md5"])
    maybe("x10_seq_chunk", x10)

    def s01():
        # tumbling-window agg (batch form — the ground truth s09's
        # streaming drain is gated against)
        ev = pd.read_parquet(P("events"), columns=["ts", "event_type", "value"])
        ev.groupby([ev.ts.dt.floor("h"), "event_type"]).agg(
            n=("value", "size"), sum_value=("value", "sum"))
    maybe("s01_window_agg", s01)

    def q27():
        # ordered funnel: per-user chained "first X strictly after t"
        # (pandas idiom: stage filter + join + min per stage)
        ev = pd.read_parquet(P("events"), columns=["user_id", "event_type", "ts"])
        us = ts_micros(ev.ts)
        df = pd.DataFrame({"u": ev.user_id, "t": ev.event_type, "us": us})
        t1 = df[df.t == "view"].groupby("u").us.min().rename("t_view")
        c = df[df.t == "click"].join(t1, on="u", how="inner")
        t2 = c[c.us > c.t_view].groupby("u").us.min().rename("t_click")
        p = df[df.t == "purchase"].join(t2, on="u", how="inner")
        t3 = p[p.us > p.t_click].groupby("u").us.min().rename("t_purchase")
        out = pd.DataFrame(index=pd.Index(df.u.unique(), name="u")) \
            .join(t1).join(t2).join(t3)
        out["stage"] = np.where(out.t_purchase.notna(), 3,
                       np.where(out.t_click.notna(), 2,
                       np.where(out.t_view.notna(), 1, 0)))
    maybe("q27_funnel", q27)

    def q28():
        # retention cohorts: distinct (user, epoch day), first-day cohort,
        # (cohort, offset) distinct-user counts
        ev = pd.read_parquet(P("events"), columns=["user_id", "ts"])
        per_day = 86400000000 if str(ev.ts.dtype).endswith("[us]") \
            else 86400000000000
        day = ev.ts.astype("int64") // per_day
        days = pd.DataFrame({"u": ev.user_id, "d": day}).drop_duplicates()
        coh = days.groupby("u").d.min().rename("c")
        j = days.join(coh, on="u")
        j.groupby([j.c, j.d - j.c]).size()
    maybe("q28_retention", q28)

    def d14():
        # bloom decontamination: same 8-gram shingles, md5 hash60, two
        # bit-slice probes against the bench position set (python sets —
        # the single-process analog of the broadcast joins)
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        M = 134217728
        def h60(s):
            return int(hashlib.md5(("19:" + s).encode()).hexdigest()[:15], 16)
        is_bench = d.doc_id.map(lambda i: h60(str(i)) % 20 == 0)
        def gramhashes(text):
            toks = re.split(r"\s+", text)
            if len(toks) < 8:
                return []
            return [h60(g) for g in
                    {" ".join(toks[i:i + 8]) for i in range(len(toks) - 7)}]
        ghs = d.text.map(gramhashes)
        pos = set()
        for lst in ghs[is_bench]:
            for gh in lst:
                pos.add(gh % M); pos.add((gh // M) % M)
        rows = []
        for did, lst in zip(d.doc_id[~is_bench], ghs[~is_bench]):
            hits = sum(1 for gh in lst
                       if gh % M in pos and (gh // M) % M in pos)
            rows.append((did, len(lst), hits, hits > 0))
        pd.DataFrame(rows, columns=["doc_id", "n_grams", "n_bloom_hits",
                                    "flagged"])
    maybe("d14_bloom_decontaminate", d14)

    def d15():
        # link-graph domain centrality, single-node form: same integer
        # PageRank recurrence (contribution (r*w)//wsum, update
        # 150000 + 85*S//100, 8 iterations) over the same md5 edge
        # grammar, in numpy index arithmetic
        d = pd.read_parquet(P("documents"), columns=["doc_id"])
        ids = d.doc_id.to_numpy().astype(np.int64)
        ndom = max(16, len(ids) // 50)
        src = ids % ndom
        h60 = lambda s: int(hashlib.md5(f"53:{s}".encode()).hexdigest()[:15], 16)
        hs = np.array([[h60(f"{i}:{j}") for j in (0, 1)] for i in ids],
                      dtype=np.uint64)
        dst = np.where(hs % 10 == 0, 0, (hs // 10) % np.uint64(ndom)).astype(np.int64)
        esrc = np.repeat(src, 2)
        edst = dst.reshape(-1)
        # (src, dst) -> weight
        key = esrc * ndom + edst
        uk, w = np.unique(key, return_counts=True)
        es, ed = uk // ndom, uk % ndom
        # np.add.at into int64: bincount's float64 weight path is exact
        # only below 2^53 per domain — a silent precision cliff at scale
        wsum = np.zeros(ndom, dtype=np.int64)
        np.add.at(wsum, es, w.astype(np.int64))
        r = np.full(ndom, 1000000, dtype=np.int64)
        for _ in range(8):
            contrib = (r[es] * w.astype(np.int64)) // wsum[es]
            s = np.zeros(ndom, dtype=np.int64)
            np.add.at(s, ed, contrib)
            r = 150000 + (85 * s) // 100
        ndocs = np.bincount(src, minlength=ndom).astype(np.int64)
        return pd.DataFrame({"dom": np.arange(ndom, dtype=np.int64),
                             "n_docs": ndocs, "w_out": wsum,
                             "rank_micros": r})
    maybe("d15_domain_rank", d15)

    def x11():
        # per-source exact discrete quantiles of token counts: sort per
        # source, index ceil(p*n/100)-1 (the same order-statistic rule)
        d = pd.read_parquet(P("documents"), columns=["source", "text"])
        tc = d.text.map(lambda t: len(re.split(r"\s+", t)))
        def prof(g):
            v = np.sort(g.to_numpy())
            n = len(v)
            return pd.Series(
                {"n_docs": n, **{f"p{p}": v[-(-p * n // 100) - 1]
                                 for p in (25, 50, 75, 90)}})
        pd.DataFrame({"source": d.source, "tc": tc}).groupby("source").tc \
            .apply(prof)
    maybe("x11_quantile_profile", x11)

    # ---- round-15 additions: retrieval family, corpus LM/keywords,
    # chunk dedup, spike detection, PII masking, repetition removal,
    # quality classifier, BPE, quantile sketch ----

    def _doc_bigram_index():
        """Shared honest-python inverted index build for e09/e11: postings
        dict tok -> [(doc, tf)], doc lengths, corpus scalars."""
        from collections import Counter, defaultdict
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        postings = defaultdict(list)
        dl = {}
        N = len(d)
        T = 0
        for did, text in zip(d.doc_id, d.text):
            toks = re.split(r"\s+", text)
            grams = [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
            T += len(grams)
            if grams:
                dl[did] = len(grams)
            for g, n in Counter(grams).items():
                postings[g].append((did, n))
        return d, postings, dl, N, T

    def _bm25_topk(d, postings, dl, N, T):
        import heapq
        from collections import defaultdict
        kept = {g: lst for g, lst in postings.items() if len(lst) * 10 <= N}
        out = []
        for did, text in zip(d.doc_id, d.text):
            if did % 100 != 0:
                continue
            toks = re.split(r"\s+", text)
            qterms = {toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)}
            scores = defaultdict(int)
            for g in qterms:
                lst = kept.get(g)
                if not lst:
                    continue
                dfg = len(lst)
                for cdoc, tfv in lst:
                    if cdoc == did:
                        continue
                    num = (2 * (N - dfg) + 1) * 44 * T * tfv * 1000000
                    den = (2 * dfg + 1) * (20 * T * tfv + 6 * T + 18 * dl[cdoc] * N)
                    scores[cdoc] += num // den
            top = heapq.nsmallest(10, scores.items(), key=lambda kv: (-kv[1], kv[0]))
            out.extend((did, c, m / 1e6, r + 1) for r, (c, m) in enumerate(top))
        return pd.DataFrame(out, columns=["q_id", "doc_id", "score", "rnk"])

    def e09():
        d, postings, dl, N, T = _doc_bigram_index()
        return _bm25_topk(d, postings, dl, N, T)
    maybe("e09_bm25_topk", e09)

    def e10():
        # hybrid RRF: the lexical list is e09's python form; the dense
        # list is the honest single-process exact top-10 (one numpy
        # matmul — the baseline has no ANN index to consult). Fusion is
        # the same integer 1e6 // (60 + rank).
        from collections import defaultdict
        d, postings, dl, N, T = _doc_bigram_index()
        lex = _bm25_topk(d, postings, dl, N, T)
        e = pd.read_parquet(P("embeddings"))
        ids = e.vec_id.to_numpy()
        M = np.stack(e.embedding.to_numpy()).astype(np.float64)
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        qm = ids % 100 == 0
        sims = M[qm] @ M.T
        fused = defaultdict(lambda: [0, None, None])
        for qi, q in enumerate(ids[qm]):
            row = sims[qi].copy()
            row[ids == q] = -np.inf
            top = np.argsort(-row, kind="stable")[:10]
            for r, j in enumerate(top, 1):
                f = fused[(q, ids[j])]
                f[0] += 1000000 // (60 + r); f[2] = r
        for q, c, r in zip(lex.q_id, lex.doc_id, lex.rnk):
            f = fused[(q, c)]
            f[0] += 1000000 // (60 + r); f[1] = r
        rows = sorted(((q, c, m, lr, dr) for (q, c), (m, lr, dr) in
                       fused.items()), key=lambda x: (x[0], -x[2], x[1]))
        out = []
        last, n = None, 0
        for q, c, m, lr, dr in rows:
            n = n + 1 if q == last else 1
            last = q
            if n <= 10:
                out.append((q, c, m / 1e6, lr, dr, n))
        # category note: the baseline's dense list is EXACT brute-force
        # (a single-process engineer's one-matmul path), Spark's is
        # e05's IVFxPQ — the fused row sets legitimately differ, so this
        # frame is not row-validated (the fusion MATH is validated
        # transitively: python-fusing Spark's dumped e09 x e05 equals
        # Spark's e10 dump — see BENCH.md).
        pd.DataFrame(out, columns=["q_id", "doc_id", "rrf", "lex_rnk",
                                   "den_rnk", "rnk"])
        return None
    maybe("e10_hybrid_rrf", e10)

    def e11():
        # incremental append: base postings built and kept, batch postings
        # merged in, global df/N/T recomputed over the union, then the
        # same scoring — the honest python analog of append-not-rebuild.
        from collections import Counter, defaultdict
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        def build(sub):
            postings = defaultdict(list); dl = {}; T = 0
            for did, text in zip(sub.doc_id, sub.text):
                toks = re.split(r"\s+", text)
                grams = [toks[i] + " " + toks[i + 1]
                         for i in range(len(toks) - 1)]
                T += len(grams)
                if grams:
                    dl[did] = len(grams)
                for g, n in Counter(grams).items():
                    postings[g].append((did, n))
            return postings, dl, T
        base, batch = d[d.doc_id % 5 != 0], d[d.doc_id % 5 == 0]
        pb, dlb, tb = build(base)
        pc, dlc, tc = build(batch)
        for g, lst in pc.items():
            pb[g].extend(lst)
        dlb.update(dlc)
        return _bm25_topk(d, pb, dlb, len(d), tb + tc)
    maybe("e11_postings_append", e11)

    def e16():
        # composed postings lifecycle: per-slice postings dicts composed
        # append -> delete -> append (the delete drops ALL takedown rows
        # and decrements N/T additively; batch2 re-ingests a third of
        # them), global df/cap re-derived over the live union, the same
        # scorer — the honest single-process segmented-index form.
        from collections import Counter, defaultdict
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        def build(sub):
            postings = defaultdict(list); dl = {}; T = 0
            for did, text in zip(sub.doc_id, sub.text):
                toks = re.split(r"\s+", text)
                grams = [toks[i] + " " + toks[i + 1]
                         for i in range(len(toks) - 1)]
                T += len(grams)
                if grams:
                    dl[did] = len(grams)
                for g, n in Counter(grams).items():
                    postings[g].append((did, n))
            return postings, dl, T
        base = d[(d.doc_id % 5 != 0) & (d.doc_id % 5 != 1)]
        batch1 = d[d.doc_id % 5 == 0]
        batch2 = d[(d.doc_id % 5 == 1) |
                   ((d.doc_id % 10 == 3) & (d.doc_id % 3 == 0))]
        post, dl, T = build(base)
        p1, dl1, t1 = build(batch1)
        for g, lst in p1.items():
            post[g].extend(lst)
        dl.update(dl1)
        N = len(base) + len(batch1)
        T += t1
        deleted = set(int(i) for i in d.doc_id if i % 10 == 3)
        dn = sum(1 for i in deleted)  # the slice sits wholly in base
        dt = sum(dl.get(i, 0) for i in deleted)
        post = {g: [(c, t) for c, t in lst if c not in deleted]
                for g, lst in post.items()}
        post = {g: lst for g, lst in post.items() if lst}
        dl = {i: v for i, v in dl.items() if i not in deleted}
        N -= dn; T -= dt
        p2, dl2, t2 = build(batch2)
        for g, lst in p2.items():
            post.setdefault(g, []).extend(lst)
        dl.update(dl2)
        N += len(batch2); T += t2
        live = d[~((d.doc_id % 10 == 3) & (d.doc_id % 3 != 0))]
        return _bm25_topk(live, post, dl, N, T)
    maybe("e16_postings_lifecycle", e16)

    def e14():
        # postings takedown: build the full index, strip the deleted
        # docs' rows, decrement N/T by their additive contributions,
        # re-derive the df cap over the remainder, score the surviving
        # queries — the honest single-process delete-not-rebuild form
        # (e11's append run in reverse).
        d, postings, dl, N, T = _doc_bigram_index()
        deleted = set(d.doc_id[d.doc_id % 10 == 3])
        dn = len(deleted)
        dt = sum(dl.get(i, 0) for i in deleted)
        post2 = {}
        for g, lst in postings.items():
            kept = [(c, t) for c, t in lst if c not in deleted]
            if kept:
                post2[g] = kept
        dl2 = {i: v for i, v in dl.items() if i not in deleted}
        rem = d[~d.doc_id.isin(deleted)]
        return _bm25_topk(rem, post2, dl2, N - dn, T - dt)
    maybe("e14_postings_delete", e14)

    def t10():
        from collections import Counter
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        grams = {did: [t[i] + " " + t[i + 1] for i in range(len(t) - 1)]
                 for did, t in ((did, re.split(r"\s+", x))
                                for did, x in zip(d.doc_id, d.text))}
        c12 = Counter(g for gs in grams.values() for g in gs)
        t2 = sum(c12.values())
        rows = []
        for did, gs in grams.items():
            bits = [(t2 // c12[g]).bit_length() - 1 for g in gs]
            rows.append((did, len(gs), sum(bits), max(bits, default=0),
                         sum(1 for g in gs if c12[g] <= 2),
                         round(sum(bits) / len(gs), 6) if gs else 0.0))
        return pd.DataFrame(rows, columns=["doc_id", "n_bigrams", "sum_bits",
                                           "max_bits", "n_rare_bigrams", "mean_bits"])
    maybe("t10_ngram_lm_score", t10)

    def t11():
        from collections import Counter
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        N = len(d)
        tf = {}
        df = Counter()
        for did, text in zip(d.doc_id, d.text):
            t = re.split(r"\s+", text)
            c = Counter(t[i] + " " + t[i + 1] for i in range(len(t) - 1))
            tf[did] = c
            df.update(c.keys())
        rows = []
        for did, c in tf.items():
            scored = sorted(
                ((-(tfv * (2 * (N - df[g]) + 1) * 1000000 // (2 * df[g] + 1)),
                  g, tfv) for g, tfv in c.items()))[:5]
            rows.extend((did, g, tfv, df[g], -neg / 1e6, r + 1)
                        for r, (neg, g, tfv) in enumerate(scored))
        return pd.DataFrame(rows, columns=["doc_id", "term", "tf", "df",
                                           "tfidf", "rnk"])
    maybe("t11_tfidf_keywords", t11)

    def x12():
        from collections import defaultdict
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        shift = int(d.doc_id.max()) + 1
        seen = defaultdict(list)
        for did, text in zip(d.doc_id, d.text):
            toks = re.split(r"\s+", text)
            n = len(toks)
            n_chunks = 1 if n <= 32 else (n - 32 + 23) // 24 + 1
            for cn in range(n_chunks):
                h = hashlib.md5(
                    " ".join(toks[cn * 24:cn * 24 + 32]).encode()).hexdigest()
                seen[h].append((int(did), cn))
                seen[h].append((int(did) + shift, cn))
        rows = []
        for h, occ in seen.items():
            if len(occ) >= 2:
                kd, kc = min(occ)
                rows.append((h, kd, kc, len(occ), len({o[0] for o in occ})))
        return pd.DataFrame(rows, columns=["chunk_md5", "keep_doc", "keep_chunk",
                                           "n_copies", "n_docs"])
    maybe("x12_chunk_dedup", x12)

    def q29():
        e = pd.read_parquet(P("events"), columns=["event_type", "ts"])
        day = ts_micros(e.ts) // 86400000000
        daily = (pd.DataFrame({"t": e.event_type, "d": day})
                 .groupby(["t", "d"]).size().rename("n").reset_index()
                 .sort_values(["t", "d"]).reset_index(drop=True))
        daily["n2"] = daily.n.astype("int64") ** 2
        g = daily.groupby("t")
        # trailing-EXCLUSIVE 7-day stats: rolling includes the current
        # row, so shift(1) within the group gives rows -7..-1.
        roll = lambda col, how: g[col].transform(
            lambda s: getattr(s.rolling(7, min_periods=1), how)().shift(1))
        # count of an empty window is 0; sum of one is NULL (Spark parity)
        daily["trail_n"] = roll("n", "count").fillna(0)
        daily["trail_sum"] = roll("n", "sum")
        daily["trail_sq"] = roll("n2", "sum")
        lhs = (7 * daily.n - daily.trail_sum) ** 2
        rhs = 9 * (7 * daily.trail_sq - daily.trail_sum ** 2)
        daily["trail_mean"] = np.where(
            daily.trail_n > 0, (daily.trail_sum / daily.trail_n).round(6),
            np.nan)
        daily["is_spike"] = (daily.trail_n == 7) & (lhs > rhs)
        return pd.DataFrame({
            "event_type": daily.t, "day": daily.d, "n": daily.n,
            "trail_n": daily.trail_n.astype("int64"),
            "trail_sum": daily.trail_sum,
            "trail_mean": daily.trail_mean, "is_spike": daily.is_spike})
    maybe("q29_event_spike", q29)

    def t05():
        c = pd.read_parquet(P("customer"),
                            columns=["c_custkey", "c_nationkey", "c_name"])
        def luhn(s):
            tot = 0
            for i, ch in enumerate(s):
                v = int(ch)
                if (len(s) - 1 - i) % 2 == 1:
                    v *= 2
                    if v > 9:
                        v -= 9
                tot += v
            return tot
        k, nk = c.c_custkey.astype("int64"), c.c_nationkey.astype("int64")
        base15 = ("4" + (k % 1000000).astype(str).str.zfill(6) +
                  ((k * 7919 + nk) % 100000000).astype(str).str.zfill(8))
        correct = base15.map(lambda b: (10 - luhn(b + "0") % 10) % 10)
        check = np.where(k % 2 == 0, correct, (correct + 5) % 10)
        raw = ("contact " + c.c_name.str.replace(r"[^A-Za-z0-9#]", "",
                                                 regex=True).str.lower() +
               " at user" + k.astype(str) + "@example" + nk.astype(str) +
               ".com or 555-" + (k % 1000).astype(str).str.zfill(3) +
               "-" + (nk * 173 % 10000).astype(str).str.zfill(4) +
               " ip 192." + (k % 254 + 1).astype(str) +
               "." + (nk % 250).astype(str) +
               "." + (k * 7 % 250).astype(str) +
               " card " + base15 + pd.Series(check, index=c.index).astype(str))
        masked = raw.str.replace(r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}",
                                 "[EMAIL]", regex=True) \
            .str.replace(r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]",
                         regex=True) \
            .str.replace(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]",
                         regex=True)
        card = re.compile(r"\b[0-9]{16}\b")
        masked = masked.map(lambda s: card.sub(
            lambda m: "[CARD]" if luhn(m.group()) % 10 == 0 else m.group(), s))
        n_em = raw.str.count(r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}")
        n_ph = raw.str.count(r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b")
        n_ip = raw.str.count(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")
        cands = raw.map(lambda s: card.findall(s))
        return pd.DataFrame({
            "c_custkey": k, "raw": raw, "masked": masked,
            "n_emails": n_em.astype("int64"), "n_phones": n_ph.astype("int64"),
            "n_ips": n_ip.astype("int64"),
            "n_cards": cands.map(len).astype("int64"),
            "n_cards_valid": cands.map(
                lambda cs: sum(1 for x in cs if luhn(x) % 10 == 0)
            ).astype("int64")})
    maybe("t05_pii_mask", t05)

    def t12():
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        rows = []
        for did, text in zip(d.doc_id, d.text):
            if did % 3 == 0:
                text = text + " " + text
            toks = re.split(r"\s+", text)
            first = {}
            rm = set()
            nrep = 0
            for i in range(len(toks) - 7):
                g = " ".join(toks[i:i + 8])
                if g in first:
                    nrep += 1
                    rm.update(range(i, i + 8))
                else:
                    first[g] = i
            kept = [t for j, t in enumerate(toks) if j not in rm]
            rows.append((did, len(toks), len(rm), nrep, " ".join(kept)))
        return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_removed",
                                           "n_repeat_windows", "cleaned_text"])
    maybe("t12_repeat_removal", t12)

    def t13():
        d = pd.read_parquet(P("documents"),
                            columns=["doc_id", "text", "n_chars"])
        stops = {"the", "of", "and", "to", "in", "is", "was", "that",
                 "for", "it", "with", "as"}
        dig = re.compile(r"^[0-9]+$")
        rows = []
        for did, text, nc in zip(d.doc_id, d.text, d.n_chars.astype("int64")):
            toks = re.split(r"\s+", text)
            n = len(toks)
            npunct = len(re.findall(r"[.!?,;:]", text))
            nstop = sum(1 for t in toks if t in stops)
            ndig = sum(1 for t in toks if dig.match(t))
            ndist = len(set(toks))
            f = (min(nc, 2000) * 1000000 // 2000,
                 nstop * 1000000 // n, ndist * 1000000 // n,
                 npunct * 1000000 // max(nc, 1), ndig * 1000000 // n)
            score = 2 * f[0] + 3 * f[1] + 2 * f[2] - 4 * f[3] - 3 * f[4]
            rows.append((did, n) + f + (score, score >= 1400000))
        return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "len_ppm",
                                           "stop_ppm", "distinct_ppm", "punct_ppm",
                                           "digit_ppm", "score_micros", "keep"])
    maybe("t13_quality_classifier", t13)

    def t14():
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        block = ("javascript", "cookie", "lorem")
        rows = []
        for did, text in zip(d.doc_id.astype("int64"), d.text):
            toks = re.split(r"\s+", text)
            n = len(toks)
            L = 4 + did % 5
            nl = (n + L - 1) // L
            n_kept = n_pol = n_unt = n_short = 0
            kept = []
            for i in range(nl):
                txt = " ".join(toks[i * L:i * L + L])
                cnt = min(L, n - i * L)
                if (did + i) % 7 == 0:
                    m = (did + i) % 21
                    txt += " " + ("javascript" if m == 0 else
                                  "cookie" if m == 7 else "lorem")
                    cnt += 1
                if (did + i) % 3 != 0:
                    txt += "."
                if any(w in txt for w in block):
                    n_pol += 1
                elif not txt.endswith("."):
                    n_unt += 1
                elif cnt < 5:
                    n_short += 1
                else:
                    n_kept += 1
                    kept.append(txt)
            rows.append((did, nl, n_kept, n_pol, n_unt, n_short,
                         n_kept >= 3, "\n".join(kept)))
        return pd.DataFrame(rows, columns=[
            "doc_id", "n_lines", "n_kept", "n_policy", "n_unterminated",
            "n_short", "keep", "cleaned_text"])
    maybe("t14_boilerplate_filter", t14)

    def x13():
        from collections import Counter
        d = pd.read_parquet(P("documents"), columns=["text"])
        vocab = Counter()
        word = re.compile(r"^[a-z0-9]+$")
        for text in d.text:
            vocab.update(t for t in re.split(r"\s+", text) if word.match(t))
        sym = {t: tuple(t) for t in vocab}
        out = []
        for r in range(1, 9):
            pairs = Counter()
            for t, ss in sym.items():
                f = vocab[t]
                for i in range(len(ss) - 1):
                    pairs[(ss[i], ss[i + 1])] += f
            (l, rr), cnt = min(pairs.items(),
                               key=lambda kv: (-kv[1], kv[0]))
            out.append((r, l, rr, l + rr, cnt))
            for t, ss in sym.items():
                if len(ss) < 2:
                    continue
                ns, i = [], 0
                while i < len(ss):
                    if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == rr:
                        ns.append(l + rr); i += 2
                    else:
                        ns.append(ss[i]); i += 1
                sym[t] = tuple(ns)
        return pd.DataFrame(out, columns=["rnd", "lhs", "rhs", "merged", "freq"])
    maybe("x13_bpe_merges", x13)

    def x17():
        # batched BPE: one pair-count pass accepts the top-4
        # non-conflicting (symbol-disjoint) pairs, 4 rounds
        from collections import Counter
        d = pd.read_parquet(P("documents"), columns=["text"])
        vocab = Counter()
        word = re.compile(r"^[a-z0-9]+$")
        for text in d.text:
            vocab.update(t for t in re.split(r"\s+", text) if word.match(t))
        sym = {t: tuple(t) for t in vocab}
        out = []
        for r in range(1, 5):
            pairs = Counter()
            for t, ss in sym.items():
                f = vocab[t]
                for i in range(len(ss) - 1):
                    pairs[(ss[i], ss[i + 1])] += f
            used, accepted = set(), []
            for (l, rr), cnt in sorted(pairs.items(),
                                       key=lambda kv: (-kv[1], kv[0])):
                if len(accepted) == 4:
                    break
                if l not in used and rr not in used:
                    accepted.append((l, rr, cnt))
                    used.add(l); used.add(rr)
            for k, (l, rr, cnt) in enumerate(accepted, 1):
                out.append((r, k, l, rr, l + rr, cnt))
                for t, ss in sym.items():
                    if len(ss) < 2:
                        continue
                    ns, i = [], 0
                    while i < len(ss):
                        if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == rr:
                            ns.append(l + rr); i += 2
                        else:
                            ns.append(ss[i]); i += 1
                    sym[t] = tuple(ns)
        return pd.DataFrame(out, columns=["rnd", "pick", "lhs", "rhs",
                                          "merged", "freq"])
    maybe("x17_bpe_merges_batched", x17)

    def x16():
        from collections import Counter
        d = pd.read_parquet(P("documents"), columns=["doc_id", "text"])
        word = re.compile(r"^[a-z0-9]+$")
        vocab = Counter()
        for text in d.text:
            vocab.update(t for t in re.split(r"\s+", text) if word.match(t))
        sym = {t: tuple(t) for t in vocab}
        merges = []
        for r in range(8):
            pairs = Counter()
            for t, ss in sym.items():
                f = vocab[t]
                for i in range(len(ss) - 1):
                    pairs[(ss[i], ss[i + 1])] += f
            (l, rr), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((l, rr))
            for t, ss in sym.items():
                ns, i = [], 0
                while i < len(ss):
                    if i + 1 < len(ss) and ss[i] == l and ss[i + 1] == rr:
                        ns.append(l + rr); i += 2
                    else:
                        ns.append(ss[i]); i += 1
                sym[t] = tuple(ns)
        nsym_of = {t: len(ss) for t, ss in sym.items()}
        rows = []
        for did, text in zip(d.doc_id.astype("int64"), d.text):
            toks = [t for t in re.split(r"\s+", text) if word.match(t)]
            base = sum(len(t) for t in toks)
            nsym = sum(nsym_of[t] for t in toks)
            rows.append((did, len(toks), base, nsym, base - nsym))
        return pd.DataFrame(rows, columns=[
            "doc_id", "n_enc_tokens", "n_base_symbols", "n_symbols",
            "n_merges_applied"])
    maybe("x16_bpe_encode", x16)

    def x14():
        d = pd.read_parquet(P("documents"),
                            columns=["source", "doc_id", "text", "n_chars"])
        v = (d.n_chars.astype("int64") * 1000000 //
             d.text.map(lambda t: max(len(re.split(r"\s+", t)), 1)))
        h = d.doc_id.map(lambda i: int(hashlib.md5(
            ("41:" + str(i)).encode()).hexdigest()[:15], 16))
        df = pd.DataFrame({"source": d.source, "h": h, "v": v})
        rows = []
        for src, g in df.groupby("source"):
            smp = np.sort(g.sort_values(["h", "v"]).v.to_numpy()[:256])
            m = len(smp)
            rows.append((src, len(g), m) +
                        tuple(int(smp[-(-p * m // 100) - 1])
                              for p in (25, 50, 75, 90)))
        return pd.DataFrame(rows, columns=["source", "n_docs", "sample_m",
                                           "p25_micros", "p50_micros",
                                           "p75_micros", "p90_micros"])
    maybe("x14_quantile_sketch", x14)

    def x15():
        import math
        d = pd.read_parquet(P("documents"), columns=["doc_id", "source"])
        h60 = lambda seed, s: int(
            hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)
        src_num = d.source.str.extract(r"(\d+)$")[0].fillna(0).astype(int)
        k = (1 + src_num % 4).to_numpy()
        hs = np.array([h60(41, i) for i in d.doc_id])
        sk = d[(hs % k) == 0]
        cnt = sk.groupby("source").size().to_dict()
        wt = {s: math.isqrt(n) for s, n in cnt.items()}
        B = sum(cnt.values()); W = sum(wt.values())
        rows = []
        for did, src in zip(sk.doc_id.astype("int64"), sk.source):
            n, w = cnt[src], wt[src]
            ef = B * w // (W * n)
            ne = ef + (1 if h60(37, did) * W * n <
                       (1 << 60) * (B * w - ef * W * n) else 0)
            rows.extend((did, src, e) for e in range(ne))
        return pd.DataFrame(rows, columns=["doc_id", "source", "epoch"])
    maybe("x15_temperature_mix", x15)

    total = round(sum(res.values()), 3)
    print(json.dumps({"metric": "baseline_total", "value": total,
                      "unit": "sec", "queries": res, "sf": sf}))

if __name__ == "__main__":
    args = sys.argv[2:]
    if args and args[0] == "--validate":
        VALIDATE = args[1]
        args = args[2:]
    ONLY = set(args)
    main(sys.argv[1])
