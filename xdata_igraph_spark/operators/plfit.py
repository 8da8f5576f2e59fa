"""Power-law fitting — Clauset–Shalizi–Newman MLE + KS xmin selection.

Reference: igraph_power_law_fit (/root/reference/src/other.c:324),
which drives the vendored plfit library
(/root/reference/src/plfit/plfit.c). Semantics reproduced here:

- continuous case (any non-integer sample present, or forced):
  alpha = 1 + m / Σ ln(x_i/xmin) over the tail x ≥ xmin
  (plfit.c:176); KS statistic D against F(x) = 1 − (xmin/x)^(α−1)
  with the lower empirical CDF (plfit.c:181).
- discrete case (all-integer samples): alpha maximizes
  L(α) = −α·Σ ln x_i − m·ln ζ(α, xmin) (Hurwitz zeta, plfit.c:505);
  the reference optimizes with L-BFGS — the likelihood is concave in
  α (exponential family), so a ternary search converges to the same
  optimum; KS against F(x) = 1 − ζ(α,x)/ζ(α,xmin) (plfit.c:610).
- xmin auto-selection: evaluate every distinct sample value as a
  candidate xmin and keep the smallest D (the canonical
  Clauset-et-al linear scan — plfit's golden-section shortcut
  approximates the same objective and falls back to this scan).
  The continuous scan's n used for p/finite-size purposes is
  tail+1, matching plfit.c:359/376 exactly.
- finite-size correction when the INPUT has < 50 samples (the
  reference flips the option on total size, other.c:337, but applies
  it with the tail size): alpha ← alpha·(n−1)/n + 1/n (plfit.c:118).
- p-value = Q_KS(D·√n) (plfit/kolmogorov.c:60; the standard
  Kolmogorov distribution complement).

Distributed strategy: every quantity above depends on the samples
only through the (value → count) histogram, so the single Spark job
is one groupBy-count over the data column — the degree histogram of
a 10^12-edge graph is a few thousand rows. The scan/optimization
runs vectorized on the collected histogram (numpy suffix sums), as
driver-side as the reference's own plfit loop.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BERN = [1 / 6, -1 / 30, 1 / 42, -1 / 30, 5 / 66, -691 / 2730, 7 / 6]


def hzeta(s: float, q) -> np.ndarray | float:
    """Hurwitz zeta ζ(s, q) for s > 1, q > 0 (vectorized over q) via
    Euler–Maclaurin (the same classical scheme GSL's gsl_sf_hzeta
    uses; ~1e-14 relative for q ≥ 1)."""
    q = np.asarray(q, dtype=float)
    N = 12
    k = np.arange(N)
    base = np.power(q[..., None] + k, -s).sum(axis=-1)
    qN = q + N
    tail = np.power(qN, 1 - s) / (s - 1) + 0.5 * np.power(qN, -s)
    corr = np.zeros_like(q)
    fact = s
    qpow = np.power(qN, -s - 1)
    for j, b in enumerate(_BERN):
        corr = corr + b / math.factorial(2 * (j + 1)) * fact * qpow
        # advance (s)_{2j+1} -> (s)_{2j+3} and the power of qN
        fact = fact * (s + 2 * j + 1) * (s + 2 * j + 2)
        qpow = qpow / (qN * qN)
    out = base + tail + corr
    return out if out.ndim else float(out)


def _kolmogorov_q(z: float) -> float:
    """Q_KS(z) = P(K > z): complement of the Kolmogorov distribution
    (plfit/kolmogorov.c:28 uses the same classical piecewise
    approximation)."""
    u = abs(z)
    if u < 0.2:
        return 1.0
    if u < 0.755:
        v = 1.0 / (u * u)
        w = 2.50662827463
        return 1 - w * (
            math.exp(-1.2337005501361697 * v)
            + math.exp(-11.103304951225528 * v)
            + math.exp(-30.842513753404244 * v)
        ) / u
    if u < 6.8116:
        v = u * u
        maxj = max(1, int(3.0 / u + 0.5))
        fj = [-2.0, -8.0, -18.0, -32.0]
        r = [math.exp(fj[j] * v) for j in range(maxj)]
        total = 0.0
        for j, val in enumerate(r):
            total += val if j % 2 == 0 else -val
        return 2 * total
    return 0.0


def _histogram(data, column: str | None):
    if isinstance(data, DataFrame):
        col = column or data.columns[0]
        rows = (
            data.select(F.col(col).cast("double").alias("x"))
            .filter(F.col("x").isNotNull())
            .groupBy("x")
            .count()
            .collect()
        )
        hist = sorted((r["x"], int(r["count"])) for r in rows)
    else:
        counts: dict[float, int] = {}
        for v in data:
            counts[float(v)] = counts.get(float(v), 0) + 1
        hist = sorted(counts.items())
    return (
        np.array([h[0] for h in hist]),
        np.array([h[1] for h in hist], dtype=np.int64),
    )


def _ks_continuous(u, c, alpha, xmin, lo_idx):
    m = int(c[lo_idx:].sum())
    Fv = 1 - np.power(xmin / u[lo_idx:], alpha - 1)
    hi = np.cumsum(c[lo_idx:])
    lo = hi - c[lo_idx:]
    return float(
        np.maximum(np.abs(Fv - lo / m), np.abs(Fv - (hi - 1) / m)).max()
    )


def _ks_discrete(u, c, alpha, xmin, lo_idx):
    m = int(c[lo_idx:].sum())
    hz0 = hzeta(alpha, xmin)
    Fv = 1 - hzeta(alpha, u[lo_idx:]) / hz0
    lo = np.cumsum(c[lo_idx:]) - c[lo_idx:]
    return float(np.abs(Fv - lo / m).max())


def _alpha_continuous(u, c, lo_idx, xmin=None):
    xmin = u[lo_idx] if xmin is None else xmin
    m = c[lo_idx:].sum()
    logsum = float((c[lo_idx:] * np.log(u[lo_idx:] / xmin)).sum())
    if logsum <= 0:
        return math.inf
    return 1 + m / logsum


def _alpha_discrete(u, c, lo_idx, xmin=None):
    """Maximize −α·logsum − m·ln ζ(α, xmin) by ternary search (the
    objective is concave in α)."""
    xmin = u[lo_idx] if xmin is None else xmin
    m = float(c[lo_idx:].sum())
    logsum = float((c[lo_idx:] * np.log(u[lo_idx:])).sum())

    def negL(a):
        return a * logsum + m * math.log(hzeta(a, xmin))

    lo, hi = 1.0 + 1e-7, 64.0
    for _ in range(200):
        d = (hi - lo) / 3
        if d < 1e-10:
            break
        m1, m2 = lo + d, hi - d
        if negL(m1) <= negL(m2):
            hi = m2
        else:
            lo = m1
    return (lo + hi) / 2


def power_law_fit(
    data,
    column: str | None = None,
    xmin: float | None = None,
    force_continuous: bool = False,
    max_unique_values: int = 100_000,
) -> dict:
    """Fit a power law → dict(continuous, alpha, xmin, L, D, p).

    ``data``: a DataFrame (``column`` selects the sample column;
    default first column — e.g. feed ``graph.degrees()`` with
    column="degree") or any Python sequence. ``xmin=None`` (the
    reference's negative xmin) auto-selects the KS-optimal cutoff;
    ``xmin=0`` keeps all samples. Matches igraph_power_law_fit
    (/root/reference/src/other.c:324) on the reference's own test
    vectors to ~1e-5.
    """
    u, c = _histogram(data, column)
    if len(u) == 0:
        raise ValueError("power_law_fit: no data points")
    if len(u) > max_unique_values:
        raise ValueError(
            f"power_law_fit: {len(u)} unique values exceeds "
            f"max_unique_values={max_unique_values}; bucket the data first"
        )
    n = int(c.sum())
    discrete = not force_continuous and bool(
        np.all(u == np.floor(u))
    )
    fsc = n < 50

    if xmin is not None and xmin >= 0:
        # fixed-xmin path: tail = samples >= xmin (>= 1 for discrete)
        eff_xmin = max(xmin, 1.0) if discrete else xmin
        lo_idx = int(np.searchsorted(u, eff_xmin, side="left"))
        if lo_idx >= len(u):
            raise ValueError("no data point was larger than xmin")
        tail_n = int(c[lo_idx:].sum())
        if discrete:
            alpha = _alpha_discrete(u, c, lo_idx, eff_xmin)
            D = _ks_discrete(u, c, alpha, eff_xmin, lo_idx)
        else:
            alpha = _alpha_continuous(u, c, lo_idx, eff_xmin)
            D = _ks_continuous(u, c, alpha, eff_xmin, lo_idx)
        best = dict(alpha=alpha, xmin=float(eff_xmin), D=D)
        n_for_p = tail_n
        best_lo = lo_idx
    else:
        best = None
        n_for_p = 0
        best_lo = 0
        if discrete:
            # candidate cutoff mirrors plfit.c:735-744: stop before the
            # block whose start index reaches n-1 minus the two last
            # distinct blocks
            starts = np.cumsum(c) - c
            end_xmin_idx = n - 1 - int(c[-1]) - (int(c[-2]) if len(c) > 1 else 0)
            cand = [i for i in range(len(u)) if starts[i] < end_xmin_idx]
        else:
            cand = list(range(len(u) - 1))
        for i in cand:
            alpha = (
                _alpha_discrete(u, c, i) if discrete else _alpha_continuous(u, c, i)
            )
            if not math.isfinite(alpha):
                continue
            D = (
                _ks_discrete(u, c, alpha, u[i], i)
                if discrete
                else _ks_continuous(u, c, alpha, u[i], i)
            )
            if best is None or D < best["D"]:
                best = dict(alpha=alpha, xmin=float(u[i]), D=D)
                tail_n = int(c[i:].sum())
                # the reference's continuous scan records tail+1 here
                # (plfit.c:359 / :376) — replicated for parity
                n_for_p = tail_n if discrete else tail_n + 1
                best_lo = i
        if best is None:
            raise ValueError("power_law_fit: degenerate sample")

    alpha, xm, D = best["alpha"], best["xmin"], best["D"]
    if fsc:
        alpha = alpha * (n_for_p - 1) / n_for_p + 1.0 / n_for_p
    p = _kolmogorov_q(D * math.sqrt(n_for_p))
    # log-likelihood of the tail under the (possibly corrected) alpha
    if discrete:
        logsum = float((c[best_lo:] * np.log(u[best_lo:])).sum())
        m = float(c[best_lo:].sum())
        L = -alpha * logsum - m * math.log(hzeta(alpha, xm))
    else:
        m = float(c[best_lo:].sum())
        logsum = float((c[best_lo:] * np.log(u[best_lo:] / xm)).sum())
        L = -alpha * logsum + math.log((alpha - 1) / xm) * m
    return {
        "continuous": not discrete,
        "alpha": float(alpha),
        "xmin": float(xm),
        "L": float(L),
        "D": float(D),
        "p": float(p),
    }
