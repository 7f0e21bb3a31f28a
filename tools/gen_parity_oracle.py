#!/usr/bin/env python3
"""Independent full-table parity oracle for the ctas pipeline.

Re-implements, in NumPy and from the R reference's documented semantics
(R/ctas.R: pick_timepoint_combos 845-972, generate_wide_timeseries_table
765-789, calculate_ts_features 589-681, calculate_autocorrelation
1197-1207, calculate_lof 526-559 via dbscan semantics,
calculate_own_site_simil_score 432-516 + auroc 570-575,
calculate_principal_components 692-750), the deterministic outputs of
`process_a_study` on the packaged fixture (src/test/resources/
ctas_fixture/*.csv, exported verbatim from data/ctas_data.rda) with the
README worked-example defaults (min timepoints 3, min subjects 3, max
share missing 0.5, all 7 features, consecutive autogen, no cfb).

No R runtime exists in this environment, so this is an INDEPENDENT
RE-IMPLEMENTATION oracle, not an R run: it shares no code with the
Scala engine (NumPy vs hand-rolled Jacobi, Python dicts vs Catalyst),
and it is anchored to the reference's own printed values by
ReferenceParitySpec's README golden-value tests, which pin ~30 numbers
of these same tables directly. Full-table agreement between the two
implementations (1e-9 on features, sign-invariant 1e-6 on PCA) plus the
README anchors is the densest parity available without R
(VERDICT r02 "Next round" #5).

Writes expected_series.csv / expected_features.csv / expected_pca.csv
next to the fixture. Deterministic; rerun after changing either side.
"""
import csv
import math
import os
import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "ctas_fixture")

TP_MIN = 3
SUBJ_MIN = 3
MAX_MISSING = 0.5


def load(name):
    with open(os.path.join(FIX, name)) as f:
        return list(csv.DictReader(f))


def main():
    data = load("data.csv")
    for r in data:
        r["rank"] = float(r["timepoint_rank"])
        r["res"] = float(r["result"]) if r["result"] != "" else math.nan
    subjects = {r["subject_id"]: r for r in load("subjects.csv")}

    # coverage bitmap: distinct (param, subject, rank) with non-null result
    coverage = {}
    for r in data:
        if not math.isnan(r["res"]):
            coverage.setdefault(r["parameter_id"], set()).add(
                (r["subject_id"], r["rank"]))

    params = sorted(coverage.keys())

    # ---- pick_timepoint_combos, consecutive mode -------------------------
    series = []  # (ts_id, param, combo, members)
    n = 0
    for param in params:
        cov = coverage[param]
        ranks = sorted({rk for (_s, rk) in cov})
        per_subj_ranks = {}
        for (s, rk) in cov:
            per_subj_ranks.setdefault(s, set()).add(rk)
        accepted = []
        prev = 0
        for ln in range(len(ranks), TP_MIN - 1, -1):
            prefix = set(ranks[:ln])
            thresh = math.ceil((1.0 - MAX_MISSING) * ln)
            el = sorted(s for s, rs in per_subj_ranks.items()
                        if len(rs & prefix) >= max(thresh, 1))
            num = len(el)
            if num >= SUBJ_MIN:
                if prev == 0 or (num - prev >= SUBJ_MIN and num / prev >= 1.2):
                    accepted.append((ranks[:ln], el))
                    prev = num
        for combo, el in accepted:
            n += 1
            series.append((f"ts_{n}_autogen_original", param, combo, el))

    # ---- wide tables, features, PCA --------------------------------------
    by_param = {}
    for r in data:
        by_param.setdefault(r["parameter_id"], []).append(r)

    feat_rows = []
    pca_rows = []
    series_rows = []
    for ts_id, param, combo, members in series:
        comboset = set(combo)
        memset = set(members)
        rows = [r for r in by_param[param]
                if r["rank"] in comboset and r["subject_id"] in memset]
        # duplicate-averaged cells; any NaN duplicate NaNs the cell
        # (pivot_wider values_fn = mean WITHOUT na.rm)
        cells = {}
        for r in rows:
            cells.setdefault((r["subject_id"], r["rank"]), []).append(r["res"])
        cols = sorted({rk for (_s, rk) in cells})
        colpos = {rk: i for i, rk in enumerate(cols)}
        subj_sorted = sorted(memset)
        m = np.full((len(subj_sorted), len(cols)), np.nan)
        for (s, rk), vs in cells.items():
            m[subj_sorted.index(s), colpos[rk]] = (
                math.nan if any(math.isnan(v) for v in vs)
                else sum(vs) / len(vs))
        series_rows.append((ts_id, param, "original",
                            ";".join(fmt_rank(c) for c in combo),
                            len(combo), len(members)))

        multi = len(cols) > 1  # original-baseline fixture: cfb absent
        for i, s in enumerate(subj_sorted):
            x = m[i]
            ok = x[~np.isnan(x)]
            feats = {}
            feats["average"] = ok.mean() if ok.size else math.nan
            if multi:
                feats["range"] = (ok.max() - ok.min()) if ok.size else math.nan
                feats["sd"] = ok.std(ddof=1) if ok.size >= 2 else math.nan
                feats["unique_value_count_relative"] = (
                    np.unique(ok).size / ok.size if ok.size else math.nan)
                feats["autocorr"] = autocorr(x)
            else:
                feats["range"] = 0.0
                feats["sd"] = 0.0
                feats["unique_value_count_relative"] = 1.0
                feats["autocorr"] = 0.0
            for fname, fv in feats.items():
                if not math.isnan(fv):
                    feat_rows.append((ts_id, s, fname, fv))

        # matrix kernels: lof + own_site_simil_score
        d = dist_matrix(m)
        lof_ok = len(d) > 0 and not any(
            math.isnan(d[i][j]) for i in range(len(d))
            for j in range(len(d)) if i != j)
        if lof_ok and len(d) > 0:
            for i, v in enumerate(lof(d)):
                vv = 1.0 if (math.isinf(v) or math.isnan(v)) else v
                feat_rows.append((ts_id, subj_sorted[i], "lof", vv))
        sites = [subjects[s]["site"] for s in subj_sorted]
        for i, sc in own_site(d, sites):
            if not math.isnan(sc) and sc >= 0:
                feat_rows.append(
                    (ts_id, subj_sorted[i], "own_site_simil_score", sc))

        for i, (p1, p2) in enumerate(pca2(m)):
            pca_rows.append((ts_id, subj_sorted[i], p1, p2))

    write("expected_series.csv",
          ["timeseries_id", "parameter_id", "baseline", "timepoint_combo",
           "timepoint_count", "n_subjects"], series_rows)
    write("expected_features.csv",
          ["timeseries_id", "subject_id", "feature", "feature_value"],
          [(a, b, c, repr(v)) for (a, b, c, v) in feat_rows])
    write("expected_pca.csv",
          ["timeseries_id", "subject_id", "pc1", "pc2"],
          [(a, b, repr(p1), repr(p2)) for (a, b, p1, p2) in pca_rows])
    print(f"{len(series_rows)} series, {len(feat_rows)} feature rows, "
          f"{len(pca_rows)} pca rows")


def fmt_rank(d):
    return str(int(d)) if d == int(d) else str(d)


def autocorr(x):
    """lag-1 Pearson, pairwise-complete (R cor(x[-n], x[-1], pairwise))"""
    a, b = x[:-1], x[1:]
    k = ~(np.isnan(a) | np.isnan(b))
    a, b = a[k], b[k]
    if a.size < 2:
        return math.nan
    sa, sb = a.std(ddof=1), b.std(ddof=1)
    if sa == 0 or sb == 0:
        return math.nan
    cov = ((a - a.mean()) * (b - b.mean())).sum() / (a.size - 1)
    return cov / (sa * sb)


def dist_matrix(m):
    """Euclidean with R stats::dist NA semantics (scale by p/np)."""
    nr, p = m.shape
    d = np.zeros((nr, nr))
    for i in range(nr):
        for j in range(i + 1, nr):
            k = ~(np.isnan(m[i]) | np.isnan(m[j]))
            np_used = int(k.sum())
            if np_used == 0:
                v = math.nan
            else:
                v = math.sqrt(((m[i][k] - m[j][k]) ** 2).sum() * p / np_used)
            d[i][j] = d[j][i] = v
    return d


def lof(d):
    """LOF, k-distance neighborhoods INCLUDING ties, k=max(1,min(10,n//3))."""
    n = len(d)
    k = max(1, min(10, n // 3))
    kdist = np.zeros(n)
    neigh = []
    for i in range(n):
        ds = sorted(d[i][j] for j in range(n) if j != i)
        kd = ds[min(k, n - 1) - 1]
        kdist[i] = kd
        neigh.append([j for j in range(n) if j != i and d[i][j] <= kd])
    lrd = np.zeros(n)
    for i in range(n):
        s = sum(max(kdist[o], d[i][o]) for o in neigh[i])
        lrd[i] = math.inf if s == 0 else len(neigh[i]) / s
    out = np.zeros(n)
    for i in range(n):
        s = sum(lrd[o] for o in neigh[i])
        out[i] = (s / len(neigh[i])) / lrd[i] if lrd[i] != 0 else math.inf
    return out


def auroc(score, bool_):
    n = len(score)
    n1 = sum(1 for b in bool_ if not b)
    n2 = n - n1
    if n1 == 0 or n2 == 0:
        return math.nan
    order = sorted(range(n), key=lambda i: (math.isnan(score[i]), -score[i]
                                            if not math.isnan(score[i]) else 0))
    ranks = [0.0] * n
    i = 0
    while i < n:
        j = i
        while (j + 1 < n and not math.isnan(score[order[j + 1]])
               and not math.isnan(score[order[i]])
               and score[order[j + 1]] == score[order[i]]):
            j += 1
        avg = (i + j + 2) / 2.0
        for t in range(i, j + 1):
            ranks[order[t]] = avg
        i = j + 1
    u = sum(ranks[i] for i in range(n) if not bool_[i]) - n1 * (n1 + 1) / 2.0
    return 1.0 - u / n1 / n2


def own_site(d, sites):
    n = len(d)
    out = []
    by_site = {}
    for i, s in enumerate(sites):
        by_site.setdefault(s, []).append(i)
    for s, members in by_site.items():
        if len(members) <= 1:
            continue
        for i in members:
            score = [d[i][j] for j in range(n) if j != i]
            bool_ = [sites[j] == sites[i] for j in range(n) if j != i]
            out.append((i, auroc(score, bool_)))
    return out


def pca2(m):
    """first two PCs per R/ctas.R:692-750 (row-mean impute, 0-var drop,
    1/2-col special cases, else centered covariance eigen)."""
    nr, p0 = m.shape
    if nr == 0:
        return []
    mm = m.copy()
    for i in range(nr):
        row = mm[i]
        mean = np.nanmean(row) if (~np.isnan(row)).any() else math.nan
        row[np.isnan(row)] = mean
    if nr < 2:
        keep = list(range(p0))
    else:
        keep = [k for k in range(p0) if mm[:, k].std(ddof=1) != 0.0]
    p = len(keep)
    if p == 0:
        return []
    if p == 1:
        return [(mm[r, keep[0]], 0.0) for r in range(nr)]
    if p == 2:
        return [(mm[r, keep[0]], mm[r, keep[1]]) for r in range(nr)]
    x = mm[:, keep] - mm[:, keep].mean(axis=0)
    cov = (x.T @ x) / max(1, nr - 1)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(-w)
    scores = x @ v[:, order[:2]]
    return [(scores[r, 0], scores[r, 1]) for r in range(nr)]


def write(name, header, rows):
    with open(os.path.join(FIX, name), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


if __name__ == "__main__":
    main()
