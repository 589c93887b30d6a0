"""Solver options — the single frozen configuration object.

The reference has *no* runtime configuration: all numerics are hardcoded consts
(feasibility/pricing epsilon ~1e-8, LU stability coefficient ~0.1, refactorization
threshold) per SURVEY.md §6.6 (`src/solver.rs`, `src/lu.rs` consts [CODE]).  We keep
that spirit: one frozen dataclass whose defaults mirror the reference's constants,
no global flag system.  The dataclass is hashable so it can be a static argument to
`jax.jit`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Numeric and engine options for the TPU LP solver.

    Defaults follow the reference's hardcoded constants where known
    (SURVEY.md §6.6: pricing/feasibility epsilon ~1e-8) and standard
    revised-simplex practice elsewhere.
    """

    # --- tolerances -----------------------------------------------------------
    #: Primal feasibility tolerance: a basic value within this of its bound is
    #: considered feasible (reference: ~1e-8, src/solver.rs consts [CODE]).
    feas_tol: float = 1e-8
    #: Dual feasibility / optimality tolerance on reduced costs.
    opt_tol: float = 1e-8
    #: Minimum acceptable pivot magnitude in the ratio test / basis update.
    pivot_tol: float = 1e-8
    #: Relative window for the ratio-test tie set (stability tie-break picks the
    #: largest |pivot| among ratios within this window of the minimum).
    ratio_tie_rel: float = 1e-7
    #: Absolute slack added to the ratio tie window.
    ratio_tie_abs: float = 1e-9

    # --- iteration control ----------------------------------------------------
    #: Hard cap on simplex iterations per phase; None → 32 * (m + n) + 1000.
    max_iter: Optional[int] = None
    #: Refactorize (rebuild the basis inverse from scratch) every this many pivots.
    #: The reference refactorizes on eta-file blowup (SURVEY.md §3.2 [BASELINE]);
    #: a fixed period is the fixed-shape XLA-friendly equivalent.  None = auto
    #: (64; 128 at M ≥ 1024 where the host SuperLU refactorization dominates).
    #: An explicit value — including 64 — is always respected verbatim, so a
    #: user fighting an ill-conditioned instance can tighten the eta-file
    #: window (ADVICE r4: the old sentinel-by-default-comparison made an
    #: explicit 64 indistinguishable from unset).
    refactor_period: Optional[int] = None
    #: Switch to Bland's anti-cycling rule after this many iterations without
    #: objective (or phase-1 infeasibility) improvement.
    bland_after: int = 50

    # --- numerics -------------------------------------------------------------
    #: Working dtype: "float64" (default; emulated but correct on TPU) or "float32".
    dtype: str = "float64"
    #: Newton refinement sweeps applied to the f32-seeded basis inverse when the
    #: working dtype is float64 on a backend without native f64 LU (TPU).
    newton_refine_iters: int = 3
    #: Engine: "simplex" (revised primal/dual simplex) or "pdhg" (first-order).
    engine: str = "simplex"
    #: Host-side presolve before canonicalization (singleton/empty/redundant row
    #: elimination + bound tightening; build-only — the reference has none).
    presolve: bool = True
    #: Single-LP Pallas megakernel routing: "auto" solves small LPs through
    #: the VMEM-resident f32 kernel when running on TPU (f64 certification on
    #: the host; silent fallback to the XLA engine when uncertified),
    #: "always" forces it (interpret mode off-TPU), "never" disables.
    use_megakernel: str = "auto"
    #: Netlib-scale TPU path: single LPs beyond the megakernel's VMEM
    #: envelope (padded M in (512, 4096], N ≤ 32768) route through the
    #: HBM-streaming Pallas kernel (A transposed in HBM, B⁻¹ VMEM-resident,
    #: one Aᵀ stream per pivot — ops/kernels/streaming_simplex.py) with the
    #: same f32-iterate + exact-f64-certify + host-polish contract; a
    #: mid-solve NUMERICAL exit (basis conditioning beyond f32) hands the
    #: basis to the exact host engine.  "always" forces it (interpret mode
    #: off-TPU), "never" disables.
    use_streaming: str = "auto"
    #: Mid-size TPU path: when an LP is too big for the megakernel's VMEM
    #: envelope and the working dtype is float64, "auto" first runs the XLA
    #: engine in float32 (loosened tolerances) and adopts the answer only
    #: after exact f64 host certification of the discovered basis — the same
    #: iterate-f32/certify-f64 pattern as the megakernel, avoiding the TPU's
    #: emulated-f64 hot loop (minutes of compile; device faults at some
    #: shapes).  "always" forces the f32 first pass on every backend,
    #: "never" disables it (straight to the f64 engine).
    f32_midsize: str = "auto"
    #: Phase-2 pricing rule: "devex" (approximate steepest-edge reference
    #: weights, the reference's "Dantzig + steepest-edge" scheme — fresh
    #: weights make early iterations Dantzig-like) or "dantzig".
    pricing: str = "devex"
    #: Reset Devex weights to 1 when the entering weight exceeds this.
    devex_reset: float = 1e8

    # --- shape padding (XLA static-shape friendliness) ------------------------
    #: Round padded row count up to a multiple of this (TPU sublane = 8).
    row_align: int = 8
    #: Round padded column count up to a multiple of this (TPU lane = 128).
    col_align: int = 128
    #: Extra row capacity for incremental `add_constraint` without recompiling.
    row_capacity_slack: int = 0

    # --- PDHG engine ----------------------------------------------------------
    pdhg_max_iter: int = 200_000
    pdhg_check_every: int = 64
    pdhg_restart_beta: float = 0.9
    #: Initial primal weight ω (τ = ω/‖A‖, σ = 1/(ω‖A‖)); None → ‖c‖/‖b‖.
    pdhg_omega: Optional[float] = None
    #: Geometric smoothing exponent for the adaptive primal-weight update at
    #: restarts (PDLP's θ; 0 disables adaptation).
    pdhg_weight_theta: float = 0.5
    #: Ruiz row/column equilibration sweeps applied before iterating.
    pdhg_ruiz_iters: int = 10
    #: Tolerance for the Farkas/recession-ray infeasibility certificates
    #: (cone residuals; the certificate margin must clear 100× this).
    pdhg_infeas_tol: float = 1e-9
    #: Constraint-matrix storage for the PDHG path: "auto" picks sparse BCOO
    #: matvecs when the instance is large and sparse, "dense"/"sparse" force.
    pdhg_matrix: str = "auto"
    #: Iteration scheme: "vanilla" (the PDLP restarted-average scheme —
    #: the default: robust ω adaptation across scalings) or "halpern"
    #: (reflected PDHG + Halpern anchoring, the cuPDLP-class accelerated
    #: variant with fixed-point-residual restarts; measured up to ~1.6×
    #: fewer iterations on well-conditioned instances, but it runs with a
    #: FROZEN primal weight — PDLP's displacement-ratio ω heuristics
    #: measurably diverge under anchored dynamics — so badly-scaled
    #: instances can stall where vanilla adapts through).
    pdhg_variant: str = "vanilla"

    # --- PDHG → simplex crossover (cold solves beyond the kernel envelope) ----
    #: "auto": cold simplex solves above the device-kernel envelope start
    #: from a PDHG-identified basis instead of the slack basis (replaces
    #: ~10⁵ cold pivots with a few hundred warm exact ones at maros scale);
    #: "never" disables.
    crossover: str = "auto"
    #: KKT tolerance the PDHG stage runs to before basis identification —
    #: the basis is combinatorial; moderate accuracy identifies it and the
    #: exact polish absorbs the residual.  Measured at the maros shape:
    #: 1e-4 → 42k PDHG iters + 710 exact pivots (56 s total); 1e-5 → 96k +
    #: 61 (100 s) — the polish absorbs looser identification far cheaper
    #: than the PDHG tail costs.
    crossover_tol: float = 1e-4

    def effective_max_iter(self, m: int, n: int) -> int:
        if self.max_iter is not None:
            return int(self.max_iter)
        return 32 * (m + n) + 1000

    def effective_refactor_period(self, m: int = 0) -> int:
        """Resolved refactorization period (None → size-scaled auto default)."""
        if self.refactor_period is not None:
            return max(int(self.refactor_period), 1)
        # SuperLU refactorization dominates at scale (measured ~115 ms at
        # m=1600 on a filled basis vs ~0.5 ms per eta-file solve): amortize
        # over a longer eta file — 128 f64 etas are numerically benign (the
        # reference's eta-file threshold is of the same order).
        return 128 if m >= 1024 else 64

    def streaming_refactor_period(self, m: int = 0) -> int:
        """Period for the HBM-streaming kernel (auto floor 128: its Newton
        refresh is the costliest block; exact candidate updates between
        refreshes absorb the extra f32 drift)."""
        if self.refactor_period is not None:
            return max(int(self.refactor_period), 1)
        return max(self.effective_refactor_period(m), 128)


DEFAULT_OPTIONS = SolverOptions()
