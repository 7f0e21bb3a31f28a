#!/usr/bin/env python3
"""One-time dev tool: independent reference values for the two-sample KS
test, pinned into StatsSpec (VERDICT r01 "Next round" #6).

The EXACT path (m*n < 10^4, no ties) is computed with exact rational
arithmetic: big-integer lattice-path counting (Hodges 1958) divided by
C(m+n, m), so the printed p-values are correct to the last double bit —
an implementation fully independent of the Scala code under test.
The ASYMPTOTIC paths use the public Kolmogorov CDF series / the
one-sided exp(-2*D^2*m*n/(m+n)) formula (R ks.test semantics).
"""
from fractions import Fraction
from math import comb, exp, pi, sqrt


def d_stats(x, y):
    """exact (dplus, dminus, two-sided D, has_ties) as Fractions"""
    xs, ys = sorted(x), sorted(y)
    m, n = len(xs), len(ys)
    i = j = 0
    dplus = dminus = Fraction(0)
    ties = False
    while i < m or j < n:
        v = xs[i] if i < m and (j >= n or xs[i] <= ys[j]) else ys[j]
        ci = cj = 0
        while i < m and xs[i] == v:
            i += 1
            ci += 1
        while j < n and ys[j] == v:
            j += 1
            cj += 1
        if ci > 1 or cj > 1 or (ci > 0 and cj > 0):
            ties = True
        diff = Fraction(i, m) - Fraction(j, n)
        dplus = max(dplus, diff)
        dminus = max(dminus, -diff)
    return dplus, dminus, max(dplus, dminus), ties


def p_exact(d, m, n, side):
    """P(D >= d) under H0, exact: 1 - (#paths with all devs < d)/C(m+n,m).
    side: 0 two-sided band, +1 only Fx-Fy, -1 only Fy-Fx."""
    def inside(i, j):
        dev = Fraction(i, m) - Fraction(j, n)
        if side == 0:
            return abs(dev) < d
        if side == 1:
            return dev < d
        return -dev < d
    u = [0] * (n + 1)
    u[0] = 1
    for j in range(1, n + 1):
        u[j] = u[j - 1] if inside(0, j) else 0
    for i in range(1, m + 1):
        u[0] = u[0] if inside(i, 0) else 0
        for j in range(1, n + 1):
            u[j] = (u[j] + u[j - 1]) if inside(i, j) else 0
    return float(1 - Fraction(u[n], comb(m + n, m)))


def pkolm(t):
    """Kolmogorov CDF (alternating series / theta transform)."""
    if t <= 0:
        return 0.0
    if t < 1.0:
        z = -pi * pi / (8 * t * t)
        s = sum(exp(z * (2 * k - 1) ** 2) for k in range(1, 21))
        return sqrt(2 * pi) / t * s
    s, sign = 0.0, 1.0
    for k in range(1, 101):
        term = sign * exp(-2 * k * k * t * t)
        s += term
        sign = -sign
        if abs(term) < 1e-17:
            break
    return max(0.0, min(1.0, 1 - 2 * s))


def p_for(x, y, alt):
    m, n = len(x), len(y)
    dplus, dminus, dboth, ties = d_stats(x, y)
    d = {"two": dboth, "greater": dplus, "less": dminus}[alt]
    if m * n < 10000 and not ties:
        side = {"two": 0, "greater": 1, "less": -1}[alt]
        return float(d), p_exact(d, m, n, side), "exact"
    if alt == "two":
        en = sqrt(m * n / (m + n))
        return float(d), 1 - pkolm(en * float(d)), "asymp2"
    en = m * n / (m + n)
    return float(d), exp(-2 * en * float(d) ** 2), "asymp1"


def sample(seed, n, scale=1.0, shift=0.0):
    """deterministic tie-free sample (splitmix-ish LCG, irrational step)"""
    out, s = [], seed
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(shift + scale * ((s >> 11) / (1 << 53)))
    return out


CASES = [
    ("x5y7", sample(1, 5), sample(2, 7)),
    ("x8y8", sample(3, 8), sample(4, 8, scale=1.3)),
    ("x20y30", sample(5, 20), sample(6, 30, shift=0.2)),
    ("x40y60shift", sample(7, 40), sample(8, 60, shift=0.35)),
    ("x150y80", sample(9, 150), sample(10, 80, shift=0.15)),  # mn=12000 asymp
    ("ties", [float(v) for v in [1, 2, 2, 3, 4, 5, 5]],
             [float(v) for v in [2, 3, 3, 4, 6, 6]]),          # ties -> asymp
]

for name, x, y in CASES:
    for alt in ("two", "greater", "less"):
        d, p, path = p_for(x, y, alt)
        print(f"{name:14s} {alt:8s} {path:7s} d={d!r} p={p!r}")
