"""HBM-streaming single-LP simplex kernel: Netlib-scale instances on one chip.

The VMEM-resident megakernel (batched_simplex.py) tops out at padded
(512, 2048) — A itself outgrows VMEM.  This kernel covers the reference's
headline instance class — 25fv47 (821×1571) through maros-r7 (3136×9408),
`src/lu.rs (lu_factorize)` [CODE]; BASELINE.md §1 — by splitting the working
set across the memory hierarchy the way the hardware wants it:

* **VMEM (persistent, whole solve)**: the dense basis inverse B⁻¹ (m², the
  only quadratic object), all (1,m)/(1,n) vectors (xB, d, Devex weights,
  maintained lo_B/hi_B/c_B, statuses), and a double-buffered (TILE_N, m)
  landing pad for A-tiles.
* **HBM**: A stored TRANSPOSED (n, m) so that (a) one matrix COLUMN — the
  FTRAN fetch — is one contiguous row DMA, and (b) the per-pivot row pass
  α = B⁻¹[r]·A streams row-tiles of Aᵀ through the MXU as (TILE_N, m)×(m, 1)
  matvecs with the d/weights updates fused into the same tile visit.
* **HBM scratch (3, m, m)**: the periodic Newton refresh stages B (gathered
  by m row DMAs, one per basic column) and the intermediate H = X·B there,
  so VMEM never holds more than ONE m² buffer:
      X' = 2X − (X·B)·X  — H-tiles and X'-tiles each computed from the full
  VMEM-resident X and one streamed tile, written back to HBM, then X' is
  DMA'd home.  ‖I − X·B‖∞ falls out of the same sweep as the divergence
  telltale (`ok`), exactly like engine/basis.py's refresh.

HBM traffic: ONE Aᵀ pricing stream per MAJOR iteration (phase 1 prices the
composite d₁, phase 2 recomputes d from the refreshed y), which selects the
top-`minor_k` candidates and caches their columns in a (128, m) VMEM
buffer; up to `minor_k` MINOR pivots then run entirely from VMEM (classic
revised-simplex suboptimization), with candidate reduced costs kept exact
through (1, 128)-lane updates (phase 2) or per-minor recomputation against
σ (phase 1).  Per-pivot HBM traffic is therefore ~1/K of a full stream plus
one (1, m) column DMA per candidate — the round-2 kernel streamed the whole
matrix once per pivot.  Everything else (ratio test, PFI rank-1 inverse
update, one-hot maintained-state writes) is VMEM work identical to the
megakernel.  Devex weights for non-candidates go stale between majors
("stale Devex") and are corrected when a column re-enters the candidate
set; the entering/leaving lanes sync to the full weight vector each minor.

Precision contract: f32 iterate, exact f64 host certification of the final
(basis, vstat) — `_verify_f64`, shared with the megakernel — with the same
"terminal claims only from a fresh state" rule; the driver host-polishes
near-optimal uncertified bases (driver._host_polish_from_basis).

Mosaic constraints honored (same set the megakernel documents): no dynamic
gathers inside compute (one-hot/masked selects; maintained gathered state),
i32 argmax, (1,·) row vectors, f32-pinned literals, matmul precision HIGHEST.
The basis lives in SMEM as well as VMEM: SMEM scalar reads index the
refresh's per-basic-column row DMAs.
"""

from __future__ import annotations

import functools
import sys
import time
from typing import NamedTuple

if sys.getrecursionlimit() < 10_000:
    sys.setrecursionlimit(10_000)

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...status import Status, VarStat
from .batched_simplex import _verify_f64

F32 = jnp.float32
NEG_INF = float("-inf")


class PallasStreamResult(NamedTuple):
    basis: jnp.ndarray    # (m,) int32
    vstat: jnp.ndarray    # (n,) int32
    status: jnp.ndarray   # () int32
    niter: jnp.ndarray    # () int32
    obj: jnp.ndarray      # () f64 exact recompute
    verified: jnp.ndarray  # () bool
    x: jnp.ndarray        # (n,) f64 exact vertex


class SurrenderTracker:
    """f32 precision surrender across chunk launches.

    Once phase 2 is reached, residual primal infeasibility should sit at
    f32-roundoff level; if it stays orders of magnitude above feas_tol
    without improving across chunks, the instance's conditioning exceeds
    what f32 iteration can resolve (measured at maros scale: phase 2
    wanders, re-fixing drift-induced violations forever).  The driver then
    warm-starts the exact host engine from the (near-optimal) basis.

    A chunk only counts as stalled when BOTH the infeasibility has stopped
    halving AND the claimed objective has stopped moving — the round-2
    post-mortem: a pure infeasibility count surrendered while the objective
    was still in motion, handing the host a basis an hour of exact pivots
    from optimal.  Factored out of the chunk loop so the joint-stagnation
    policy is unit-testable without hardware (VERDICT r3 weak #6).

    PHASE-AGNOSTIC since round 4: a chip run at the maros shape froze in
    PHASE 1 (constant infeasibility, flat objective, all-degenerate
    pivots) and the phase-2-only tracker let it burn 345 s of device time
    to MAX_ITER; healthy phase 1 decays infeasibility geometrically, so
    the joint not-halving + obj-flat condition is just as meaningful there.
    """

    def __init__(self, feas_tol: float, patience: int = 4):
        self.feas_tol = float(feas_tol)
        self.patience = int(patience)
        self.stalled = 0
        self.best_infeas = float("inf")
        self.last_obj: float | None = None

    def update(self, phase: int, infeas: float, obj: float) -> bool:
        """Record one chunk's exit telemetry; True ⇒ surrender now."""
        fire = False
        if infeas > 1e3 * self.feas_tol:
            obj_moving = self.last_obj is None or (
                abs(obj - self.last_obj) > 1e-6 * (1.0 + abs(obj))
            )
            if infeas >= 0.5 * self.best_infeas and not obj_moving:
                self.stalled += 1
            else:
                self.stalled = 0
            self.best_infeas = min(self.best_infeas, infeas)
            fire = self.stalled >= self.patience
        else:
            self.stalled = 0
        self.last_obj = obj
        return fire


def _stream_kernel(
    # inputs
    AT_hbm,               # (n, m) f32, HBM/ANY — A transposed
    b_ref, c_ref, lo_ref, hi_ref,     # (1,m), (1,n)×3 VMEM
    # [warm=True only] basis0 (1,m) i32, vstat0 (1,n) i32, Binv0 (m,m) f32,
    # then outputs and scratch
    *refs_and_scratch,
    m: int, n: int, slack0: int, tile_n: int, tile_m: int, max_iter: int,
    refactor_period: int, newton_sweeps: int,
    feas_tol: float, opt_tol: float, pivot_tol: float, bland_after: int,
    devex_floor: float, devex_reset: float, minor_k: int,
    regress_tol: float, se_weights: bool, minor_decay: float,
    xb_refine: bool, long_step: bool = True,
    warm: bool = False,
    b_resident: bool = False,
):
    """Single LP.  See module docstring for the memory plan.

    scratch_hbm: (3, m, m) f32 HBM staging (slot 0: X'; slot 1: H; slot 2:
        Bᵀ, gathered once per refresh and shared by all Newton sweeps).
    tilebuf: (2, tile_n, m) VMEM double buffer for Aᵀ row-tiles.
    tiltmp: (tile_n, m) VMEM general tile temporary (refresh sweeps).
    basis_smem: (m,) int32 SMEM — dynamic scalar indexing for row DMAs.
    tell: (1,) f32 SMEM — Newton divergence telltale (‖I−X·B‖∞ of the last
        refresh; > 0.5 means the basis outgrew f32 and the kernel exits
        NUMERICAL so the host f64 engine can take over mid-solve).
    sems: DMA semaphore array (2,) for the tile double buffer;
    rsem: single DMA semaphore for row/bulk copies.

    With warm=True the kernel restarts from (basis0, vstat0, Binv0) — the
    incremental API's warm restart at Netlib scale (the maintained inverse is
    the Newton seed; fresh=0 forces a refresh before any terminal claim).
    """
    refs = list(refs_and_scratch)
    BT = refs.pop() if b_resident else None  # resident Bᵀ (appended last)
    if warm:
        (basis0_ref, vstat0_ref, Binv0_ref,
         basis_out, vstat_out, status_out, niter_out, scratch_hbm, Binv_out,
         phase_out, infeas_out, obj_out,
         Binv, xB, d, loB, hiB, cB, wts, d1, W, etas,
         candcols, cand_ids, d_cand, wts_cand, vstat_cand, lstmp,
         eta_rs, Pbuf, beff,
         tilebuf, tiltmp, basis_smem, tell, sems, rsem) = refs
    else:
        (basis_out, vstat_out, status_out, niter_out, scratch_hbm, Binv_out,
         phase_out, infeas_out, obj_out,
         Binv, xB, d, loB, hiB, cB, wts, d1, W, etas,
         candcols, cand_ids, d_cand, wts_cand, vstat_cand, lstmp,
         eta_rs, Pbuf, beff,
         tilebuf, tiltmp, basis_smem, tell, sems, rsem) = refs
    ZERO = jnp.float32(0.0)
    ONE = jnp.float32(1.0)
    n_tiles = n // tile_n
    col_ids = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    row_ids = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    tcol_ids = lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)

    c = c_ref[...]
    lo = lo_ref[...]
    hi = hi_ref[...]
    b = b_ref[...]

    def sel_col(vec, q):
        if vec.dtype == jnp.int32:
            return jnp.sum(jnp.where(col_ids == q, vec, jnp.int32(0)))
        return jnp.sum(jnp.where(col_ids == q, vec, ZERO))

    def sel_row(vec, r):
        if vec.dtype == jnp.int32:
            return jnp.sum(jnp.where(row_ids == r, vec, jnp.int32(0)))
        return jnp.sum(jnp.where(row_ids == r, vec, ZERO))

    # ---- tile streaming helper -------------------------------------------------
    def tile_dma(slot, t):
        return pltpu.make_async_copy(
            AT_hbm.at[pl.ds(t * tile_n, tile_n), :],
            tilebuf.at[slot],
            sems.at[slot],
        )

    def stream_tiles(visit):
        """Double-buffered sweep over Aᵀ row-tiles; visit(t, tile (tile_n,m))."""
        tile_dma(0, 0).start()

        def body(t, _):
            slot = t % 2

            @pl.when(t + 1 < n_tiles)
            def _():
                tile_dma((t + 1) % 2, t + 1).start()

            tile_dma(slot, t).wait()
            visit(t, tilebuf[slot])
            return 0

        lax.fori_loop(0, n_tiles, body, 0)

    tb = tile_m
    m_tiles = m // tb

    if warm:
        # ---- warm restart: state handed in by the incremental API ------------
        # Binv0 arrives in HBM (a VMEM input would double the m² footprint)
        bin_dma = pltpu.make_async_copy(Binv0_ref, Binv, rsem)
        bin_dma.start()
        bin_dma.wait()
        basis_out[...] = basis0_ref[...]
        vstat_out[...] = vstat0_ref[...]
        # gathered basic bounds/costs: per-tile masked accumulation (a full
        # (m, n) mask would be ~160 MB at maros scale); masked selects keep
        # unselected ±inf bounds out of the sums
        loB[...] = jnp.zeros((1, m), F32)
        hiB[...] = jnp.zeros((1, m), F32)
        cB[...] = jnp.zeros((1, m), F32)

        def warm_gather(t, _):
            gid_t = (lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
                     + t * tile_n)
            sel = gid_t == basis0_ref[...].T              # (m, tile_n)
            sl = (slice(None), pl.ds(t * tile_n, tile_n))
            bc = lambda v: jnp.broadcast_to(v, (m, tile_n))
            loB[...] = loB[...] + jnp.sum(
                jnp.where(sel, bc(lo_ref[sl]), ZERO), axis=1, keepdims=True
            ).T
            hiB[...] = hiB[...] + jnp.sum(
                jnp.where(sel, bc(hi_ref[sl]), ZERO), axis=1, keepdims=True
            ).T
            cB[...] = cB[...] + jnp.sum(
                jnp.where(sel, bc(c_ref[sl]), ZERO), axis=1, keepdims=True
            ).T
            return 0

        lax.fori_loop(0, n_tiles, warm_gather, 0)

        def init_smem(i, _):
            basis_smem[i] = sel_row(basis0_ref[...], i)
            return 0

        lax.fori_loop(0, m, init_smem, 0)
    else:
        # ---- cold start -------------------------------------------------------
        # identity inverse built tile-by-tile: a full (m, m) iota-compare
        # would materialize two m² int32 temporaries (~80 MB at maros scale)
        def eye_tile(t, _):
            ri = lax.broadcasted_iota(jnp.int32, (tb, m), 0) + t * tb
            ci = lax.broadcasted_iota(jnp.int32, (tb, m), 1)
            Binv[pl.ds(t * tb, tb), :] = (ri == ci).astype(F32)
            return 0

        lax.fori_loop(0, m_tiles, eye_tile, 0)
        basis_out[...] = row_ids + slack0
        is_slack = (col_ids >= slack0) & (col_ids < slack0 + m)
        vstat0 = jnp.where(
            jnp.isfinite(lo), jnp.int32(VarStat.AT_LOWER),
            jnp.where(jnp.isfinite(hi), jnp.int32(VarStat.AT_UPPER),
                      jnp.int32(VarStat.FREE)),
        )
        vstat0 = jnp.where(lo == hi, jnp.int32(VarStat.FIXED), vstat0)
        vstat0 = jnp.where(is_slack, jnp.int32(VarStat.BASIC), vstat0)
        vstat_out[...] = vstat0
        loB[...] = lo[:, slack0:slack0 + m]
        hiB[...] = hi[:, slack0:slack0 + m]
        cB[...] = c[:, slack0:slack0 + m]

        def init_smem(i, _):
            basis_smem[i] = slack0 + i
            return 0

        lax.fori_loop(0, m, init_smem, 0)
    wts[...] = jnp.ones_like(c)
    tell[0] = ZERO
    # K8: sublane count of the candidate-block buffers (minor_k rounded up
    # to the 8-sublane tile; must match stream_kernel_call's scratch shapes)
    K8 = max(8, -(-int(minor_k) // 8) * 8)
    # zero the candidate column cache ONCE: unwritten lanes multiply by 0 in
    # the MXU one-hot selects, and uninitialized VMEM/interpret scratch can
    # hold NaN (0*NaN = NaN would poison the FTRAN)
    candcols[...] = jnp.zeros((K8, m), F32)

    def tile_vectors(t):
        """(vstat, c, lo, hi) slices for tile t, read from refs (Mosaic has
        no dynamic_slice on values; tile-aligned ref reads lower fine)."""
        sl = (slice(None), pl.ds(t * tile_n, tile_n))
        return vstat_out[sl], c_ref[sl], lo_ref[sl], hi_ref[sl]

    def nonbasic_x_tile(v_t, lo_t, hi_t):
        x = jnp.where(v_t == VarStat.AT_LOWER, lo_t, ZERO)
        x = jnp.where(v_t == VarStat.AT_UPPER, hi_t, x)
        x = jnp.where(v_t == VarStat.FIXED, lo_t, x)
        return x

    def recompute_vectors():
        """xB and reduced costs from Binv + statuses (streams Aᵀ twice)."""
        # rhs_eff = b − A·xN accumulated tile-wise into xB (reused as acc)
        xB[...] = b

        def acc_rhs(t, tile):
            v_t, _c_t, lo_t, hi_t = tile_vectors(t)
            xn_t = nonbasic_x_tile(v_t, lo_t, hi_t)
            xB[...] = xB[...] - jnp.dot(
                xn_t, tile, preferred_element_type=F32
            )

        stream_tiles(acc_rhs)
        if xb_refine:
            beff[...] = xB[...]          # stash b_eff = b − A·xN
        xB[...] = (Binv[...] @ xB[...].T).T
        if xb_refine:
            # one iterative-refinement step: r = b_eff − B·xB (B·xB computed
            # as A·x_full with xB scattered onto the basic columns — the
            # scatter is a per-tile (m, tile_n) one-hot contraction, the
            # same pattern as the warm-start gather), then xB += B⁻¹·r.
            # Halves the effective cond·eps_f32 error of the refreshed
            # vertex — this design's analog of the reference's stable-LU
            # accuracy (VERDICT r2 missing #5), pushing the f32 wall out
            # and shrinking the exact host polish behind every claim.
            def acc_resid(t, tile):
                gid_t = (lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
                         + t * tile_n)
                selm = (basis_out[...].T == gid_t).astype(F32)  # (m, tile_n)
                xf_t = jnp.dot(xB[...], selm,
                               preferred_element_type=F32)      # (1, tile_n)
                beff[...] = beff[...] - jnp.dot(
                    xf_t, tile, preferred_element_type=F32
                )

            stream_tiles(acc_resid)
            xB[...] = xB[...] + (Binv[...] @ beff[...].T).T
        y = cB[...] @ Binv[...]          # (1, m)
        ones_1m = jnp.ones((1, m), F32)

        def set_d(t, tile):
            v_t, c_t, _lo_t, _hi_t = tile_vectors(t)
            d_t = c_t - jnp.dot(tile, y.T, preferred_element_type=F32).T
            d_t = jnp.where(v_t == VarStat.BASIC, ZERO, d_t)
            d[:, pl.ds(t * tile_n, tile_n)] = d_t
            if se_weights:
                # exact projected-steepest-edge reference weights, refreshed
                # with the inverse: γ_j = 1 + ‖B⁻¹a_j‖² — between refreshes
                # only candidate lanes update (devex-style), so the stale
                # window is one refactor period instead of the whole solve.
                # W[j, :] = (B⁻¹ a_j)ᵀ; row-sums of W² via a contraction on
                # the shared dim (no Mosaic transpose needed).
                W_t = lax.dot_general(
                    tile, Binv[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=F32,
                )                                    # (tile_n, m)
                g_t = lax.dot_general(
                    ones_1m, W_t * W_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=F32,
                )                                    # (1, tile_n)
                wts[:, pl.ds(t * tile_n, tile_n)] = ONE + g_t

        stream_tiles(set_d)

    def gather_B():
        """Gather Bᵀ (the basic columns of Aᵀ) into scratch_hbm slot 2.

        ONE gather serves ALL Newton sweeps of a refresh (the basis does not
        change between sweeps; round 3 re-gathered per sweep — m serialized
        row DMAs each, the single most latency-bound block of the kernel)."""
        # ---- gather Bᵀ rows into slot 2 ------------------------------------
        # HBM slices must be 8-row (sublane) aligned, so each basic column's
        # row is fetched as the ALIGNED 8-row block containing it and the
        # wanted row is mask-selected in VMEM; rows are assembled 8 at a time
        # and put back with one aligned block DMA.  DMAs are double-buffered
        # (fetch j+1 overlaps the select of j; the block put overlaps the
        # next block's fetches) — with one serialized get+put per row this
        # gather dominated the per-iteration cost at maros scale.
        n_blocks = m // 8

        def get_dma(slot, i):
            idx = basis_smem[i]
            gb = (idx // 8) * 8              # provably 8-aligned offset
            return pltpu.make_async_copy(
                AT_hbm.at[pl.ds(gb, 8), :],
                tilebuf.at[slot, pl.ds(0, 8), :],
                sems.at[slot],
            )

        def put_dma(k):
            return pltpu.make_async_copy(
                tiltmp.at[pl.ds(0, 8), :],
                scratch_hbm.at[2, pl.ds(k * 8, 8), :],
                rsem,
            )

        get_dma(0, 0).start()

        def gblock(k, _):
            def grow(j, acc):
                i = k * 8 + j
                slot = i % 2

                @pl.when(i + 1 < m)
                def _():
                    get_dma((i + 1) % 2, i + 1).start()

                get_dma(slot, i).wait()
                idx = basis_smem[i]
                gb = (idx // 8) * 8
                rows8 = lax.broadcasted_iota(jnp.int32, (8, m), 0)
                row = jnp.sum(
                    jnp.where(rows8 == idx - gb,
                              tilebuf[slot, pl.ds(0, 8), :], ZERO),
                    axis=0, keepdims=True,
                )
                return jnp.where(rows8 == j, row, acc)

            blk = lax.fori_loop(0, 8, grow, jnp.zeros((8, m), F32))

            @pl.when(k > 0)
            def _():
                put_dma(k - 1).wait()   # tiltmp free again

            tiltmp[pl.ds(0, 8), :] = blk
            put_dma(k).start()
            return 0

        lax.fori_loop(0, n_blocks, gblock, 0)
        put_dma(n_blocks - 1).wait()

    def newton_sweep():
        """One Newton–Schulz sweep X ← 2X − (X·B)·X staged through HBM.

        Slot 2 holds Bᵀ (gather_B); slot 1 holds the intermediate H = X·B;
        X' lands in slot 0 and is DMA'd home at the end — VMEM never holds
        a second m² buffer.  Row-tile t of H is X[t] @ B = X[t] @ slot2ᵀ,
        built column-block by column-block with slot2 streamed row-wise;
        row-tile t of X' is 2X[t] − H[t]·X with H[t] DMA'd back and the
        full OLD X resident in VMEM.  Returns max|I − X·B| (divergence
        telltale; an inverse beyond Newton's basin shows up as an
        uncertified basis at the host anyway)."""
        # ---- H = X·B row-tiles → slot 1 --------------------------------------
        def hb_dma(slot, s):
            return pltpu.make_async_copy(
                scratch_hbm.at[2, pl.ds(s * tb, tb), :],
                tilebuf.at[slot, pl.ds(0, tb), :],
                sems.at[slot],
            )

        def h_rowtile(t, _):
            xt = Binv[pl.ds(t * tb, tb), :]              # X[t] (tb, m)
            hb_dma(0, 0).start()

            def sbody(s, _):
                slot = s % 2

                @pl.when(s + 1 < m_tiles)
                def _():
                    hb_dma((s + 1) % 2, s + 1).start()   # overlap next fetch

                hb_dma(slot, s).wait()
                bt = tilebuf[slot, pl.ds(0, tb), :]      # Bᵀ rows s-block
                blk = jnp.dot(xt, bt.T, preferred_element_type=F32)
                tiltmp[pl.ds(0, tb), pl.ds(s * tb, tb)] = blk
                return 0

            lax.fori_loop(0, m_tiles, sbody, 0)
            put = pltpu.make_async_copy(
                tiltmp.at[pl.ds(0, tb), :],
                scratch_hbm.at[1, pl.ds(t * tb, tb), :],
                rsem,
            )
            put.start()
            put.wait()
            return 0

        lax.fori_loop(0, m_tiles, h_rowtile, 0)

        # ---- X' = 2X − H·X row-tiles → slot 0, with ‖I − H‖∞ telltale --------
        # H-tile fetches are double-buffered across t (fetch t+1 overlaps the
        # (tb, m)×(m, m) MXU product of t); the X' put must complete before
        # tiltmp is rewritten, so it stays serialized — it overlaps the next
        # fetch's latency anyway.
        def hget_dma(slot, t):
            return pltpu.make_async_copy(
                scratch_hbm.at[1, pl.ds(t * tb, tb), :],
                tilebuf.at[slot, pl.ds(0, tb), :],
                sems.at[slot],
            )

        hget_dma(0, 0).start()

        def xp_rowtile(t, okmax):
            slot = t % 2

            @pl.when(t + 1 < m_tiles)
            def _():
                hget_dma((t + 1) % 2, t + 1).start()

            hget_dma(slot, t).wait()
            ht = tilebuf[slot, pl.ds(0, tb), :]          # H[t]
            xt = Binv[pl.ds(t * tb, tb), :]
            xpt = 2.0 * xt - jnp.dot(ht, Binv[...],
                                     preferred_element_type=F32)
            tiltmp[pl.ds(0, tb), :] = xpt
            put = pltpu.make_async_copy(
                tiltmp.at[pl.ds(0, tb), :],
                scratch_hbm.at[0, pl.ds(t * tb, tb), :],
                rsem,
            )
            put.start()
            put.wait()
            ri = (lax.broadcasted_iota(jnp.int32, (tb, m), 0) + t * tb
                  == lax.broadcasted_iota(jnp.int32, (tb, m), 1)).astype(F32)
            return jnp.maximum(okmax, jnp.max(jnp.abs(ri - ht)))

        resid = lax.fori_loop(0, m_tiles, xp_rowtile, ZERO)

        # ---- DMA X' home ------------------------------------------------------
        back = pltpu.make_async_copy(scratch_hbm.at[0], Binv, rsem)
        back.start()
        back.wait()
        return resid

    def gather_B_resident():
        """Gather Bᵀ directly into the RESIDENT VMEM buffer (b_resident
        path): same double-buffered aligned 8-row fetches as gather_B, but
        the assembled blocks are VMEM stores — no HBM staging round-trip,
        and the Newton sweeps read B from VMEM at MXU speed instead of
        re-streaming m² from HBM per row-tile (the round-4 refresh's
        dominant traffic term at maros scale — VERDICT r4 #3b)."""
        n_blocks = m // 8

        def get_dma(slot, i):
            idx = basis_smem[i]
            gb = (idx // 8) * 8
            return pltpu.make_async_copy(
                AT_hbm.at[pl.ds(gb, 8), :],
                tilebuf.at[slot, pl.ds(0, 8), :],
                sems.at[slot],
            )

        get_dma(0, 0).start()

        def gblock(k, _):
            def grow(j, acc):
                i = k * 8 + j
                slot = i % 2

                @pl.when(i + 1 < m)
                def _():
                    get_dma((i + 1) % 2, i + 1).start()

                get_dma(slot, i).wait()
                idx = basis_smem[i]
                gb = (idx // 8) * 8
                rows8 = lax.broadcasted_iota(jnp.int32, (8, m), 0)
                row = jnp.sum(
                    jnp.where(rows8 == idx - gb,
                              tilebuf[slot, pl.ds(0, 8), :], ZERO),
                    axis=0, keepdims=True,
                )
                return jnp.where(rows8 == j, row, acc)

            BT[pl.ds(k * 8, 8), :] = lax.fori_loop(
                0, 8, grow, jnp.zeros((8, m), F32)
            )
            return 0

        lax.fori_loop(0, n_blocks, gblock, 0)

    def newton_sweep_resident():
        """One FUSED Newton–Schulz sweep with Bᵀ resident in VMEM:
        X'[t] = 2X[t] − (X[t]·B)·X per row-tile, H never staged to HBM —
        per-sweep HBM traffic drops from ~(m_tiles+4)·m² to 2·m² (the X'
        round-trip through slot 0, still needed because X is read by every
        tile).  Telltale ‖I − X·B‖∞ falls out of the same tiles."""
        def xp_rowtile(t, okmax):
            xt = Binv[pl.ds(t * tb, tb), :]
            # H[t] = X[t]·B with B = BTᵀ: contract xt dim 1 with BT dim 1
            ht = lax.dot_general(
                xt, BT[...], (((1,), (1,)), ((), ())),
                preferred_element_type=F32,
            )                                           # (tb, m)
            xpt = 2.0 * xt - jnp.dot(ht, Binv[...],
                                     preferred_element_type=F32)
            tiltmp[pl.ds(0, tb), :] = xpt
            put = pltpu.make_async_copy(
                tiltmp.at[pl.ds(0, tb), :],
                scratch_hbm.at[0, pl.ds(t * tb, tb), :],
                rsem,
            )
            put.start()
            put.wait()
            ri = (lax.broadcasted_iota(jnp.int32, (tb, m), 0) + t * tb
                  == lax.broadcasted_iota(jnp.int32, (tb, m), 1)).astype(F32)
            return jnp.maximum(okmax, jnp.max(jnp.abs(ri - ht)))

        resid = lax.fori_loop(0, m_tiles, xp_rowtile, ZERO)
        back = pltpu.make_async_copy(scratch_hbm.at[0], Binv, rsem)
        back.start()
        back.wait()
        return resid

    recompute_vectors()

    # lane/sublane iotas for the candidate buffers.  Lane RECORDS are
    # (1, 128) (the minimum Mosaic lane tile; minor_k <= 128 of them used);
    # the candidate BLOCK buffers (candcols/W/etas/P) are (K8, m).
    lane128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    rowKS = lax.broadcasted_iota(jnp.int32, (K8, m), 0)
    colKS = lax.broadcasted_iota(jnp.int32, (K8, m), 1)
    # K8↔128 lane adapter: onehotK128[k, j] = (k == j); contractions against
    # it move (K8, 1) sublane values onto (1, 128) lane records and back
    onehotK128 = (lax.broadcasted_iota(jnp.int32, (K8, 128), 0)
                  == lax.broadcasted_iota(jnp.int32, (K8, 128), 1)
                  ).astype(F32)
    neg_inf = jnp.float32(NEG_INF)

    def recompute_d():
        """Phase-2 reduced costs from scratch: ONE Aᵀ stream — the MAJOR
        pricing pass (replaces the round-2 per-pivot incremental d/Devex
        stream; minors keep candidate reduced costs exact instead)."""
        y = cB[...] @ Binv[...]

        def set_d(t, tile):
            v_t, c_t, _lo_t, _hi_t = tile_vectors(t)
            d_t = c_t - jnp.dot(tile, y.T, preferred_element_type=F32).T
            d_t = jnp.where(v_t == VarStat.BASIC, ZERO, d_t)
            d[:, pl.ds(t * tile_n, tile_n)] = d_t

        stream_tiles(set_d)

    # carry: (status, niter, phase, noimp, fresh, force, sref, best_inf)
    def cond(carry):
        status, niter, phase, noimp, fresh, force, sref, best_inf = carry
        return (status == Status.RUNNING) & (niter < max_iter)

    def body(carry):
        """One MAJOR iteration: refresh bookkeeping, ONE full pricing
        stream, top-`minor_k` candidate selection with their Aᵀ columns
        fetched into VMEM, then up to `minor_k` MINOR pivots on the cached
        columns (classic revised-simplex suboptimization).  The round-2
        kernel streamed the whole (n, m) Aᵀ once per pivot (the d/Devex
        update); here the stream amortizes over K pivots — candidate
        reduced costs stay EXACT through per-minor (1, 128)-lane updates
        (phase 2) or per-minor recomputation against σ (phase 1), and the
        full d is recomputed at the next major from the refreshed y."""
        status, niter, phase, noimp, fresh, force, sref, best_inf = carry

        xB_pre = xB[...]
        below_pre = xB_pre < loB[...] - feas_tol
        above_pre = xB_pre > hiB[...] + feas_tol
        feasible_pre = jnp.sum((below_pre | above_pre).astype(F32)) == ZERO
        # maintained-xB feasibility only TRIGGERS the exact refresh; the
        # phase flip is confirmed on the refreshed state below (a chip run
        # at the 25fv47 shape transitioned on drifted feasibility, refreshed
        # into a still-infeasible exact state, and the phase-1-extended
        # ratio test then produced a believed-but-false UNBOUNDED)
        tentative = (phase == 1) & feasible_pre
        do_refresh = (
            tentative
            | (force == 1)
            | (sref >= jnp.int32(refactor_period))
        )

        @pl.when(do_refresh)
        def _():
            if b_resident:
                gather_B_resident()
            else:
                gather_B()
            resid = ZERO
            for _s in range(newton_sweeps):
                resid = (newton_sweep_resident() if b_resident
                         else newton_sweep())
            recompute_vectors()
            tell[0] = resid

        sref = jnp.where(do_refresh, jnp.int32(0), sref)
        # Newton divergence ⇒ the basis outgrew f32 (cond·eps_f32 ≳ 1):
        # further f32 pivots are noise, so exit NUMERICAL and let the host
        # f64 engine take over from this basis (driver handoff).
        diverged = do_refresh & (tell[0] > jnp.float32(0.5))
        fresh = jnp.where(do_refresh, jnp.int32(1), fresh)

        # ---- phase confirm/regress on the (refreshed ⇒ exact) state ---------
        # `regress_tol` is the f32 drift floor: exact-recompute residuals at
        # Netlib scale can exceed feas_tol, so phase 2 tolerates violations
        # up to it (certification/polish restore exactness at the end), but
        # beyond it the basis must go back to composite phase-1 pricing —
        # phase-2 pricing with materially infeasible basics is where the
        # false-unbounded trap lives.
        xB_now = xB[...]
        viol_now = (jnp.maximum(loB[...] - xB_now, ZERO)
                    + jnp.maximum(xB_now - hiB[...], ZERO))
        ok_now = jnp.sum(
            (viol_now > jnp.float32(regress_tol)).astype(F32)
        ) == ZERO
        transition = (phase == 1) & do_refresh & ok_now
        regress = (phase == 2) & do_refresh & ~ok_now
        phase = jnp.where(transition, jnp.int32(2),
                          jnp.where(regress, jnp.int32(1), phase))
        noimp = jnp.where(transition | regress, jnp.int32(0), noimp)
        best_inf = jnp.where(transition | regress,
                             jnp.float32(jnp.inf), best_inf)
        p1 = phase == 1

        # ---- major pricing: one Aᵀ stream ------------------------------------
        @pl.when(p1)
        def _():
            xBv0 = xB[...]
            below0 = xBv0 < loB[...] - feas_tol
            above0 = xBv0 > hiB[...] + feas_tol
            ones0 = jnp.ones_like(xBv0)
            sigma0 = jnp.where(below0, -ones0,
                               jnp.where(above0, ones0, ZERO * ones0))
            y1 = sigma0 @ Binv[...]        # (1, m)

            def set_d1(t, tile):
                v_t = vstat_out[:, pl.ds(t * tile_n, tile_n)]
                d1_t = -jnp.dot(tile, y1.T, preferred_element_type=F32).T
                d1_t = jnp.where(v_t == VarStat.BASIC, ZERO, d1_t)
                d1[:, pl.ds(t * tile_n, tile_n)] = d1_t

            stream_tiles(set_d1)

        @pl.when((~p1) & (~do_refresh))
        def _():
            recompute_d()  # a refresh in this body already recomputed d

        dcur = jnp.where(p1, d1[...], d[...])
        vstat = vstat_out[...]
        bland = noimp >= bland_after
        can_up = (vstat == VarStat.AT_LOWER) | (vstat == VarStat.FREE)
        can_dn = (vstat == VarStat.AT_UPPER) | (vstat == VarStat.FREE)
        elig = (can_up & (dcur < -opt_tol)) | (can_dn & (dcur > opt_tol))
        found_any = jnp.sum(elig.astype(F32)) > ZERO
        nelig = jnp.sum(elig.astype(jnp.int32))
        gam = jnp.where(p1, jnp.ones_like(wts[...]), wts[...])
        score0 = jnp.where(
            elig, dcur * dcur / jnp.maximum(gam, ONE * devex_floor), neg_inf
        )
        q_b = jnp.min(jnp.where(elig, col_ids, jnp.int32(n)))
        best0 = jnp.max(score0)

        # ---- candidate selection + column fetch (K aligned 8-row DMAs) -------
        # Under Bland only ONE candidate (the lowest eligible index) is taken:
        # after its pivot any lower-index column may become eligible, so the
        # rule must re-price the full set every pivot to stay anti-cycling.
        # The lane vectors MUST be re-initialized every body: VMEM scratch is
        # uninitialized on hardware, and lanes beyond the selected count
        # would otherwise read as garbage "valid" candidates (chip-measured:
        # nondeterministic corrupt pivots; interpret mode zeros scratch and
        # cannot catch it).
        cand_ids[...] = jnp.full((1, 128), -1, jnp.int32)
        vstat_cand[...] = jnp.full((1, 128), int(VarStat.FIXED), jnp.int32)
        d_cand[...] = jnp.zeros((1, 128), F32)
        wts_cand[...] = jnp.ones((1, 128), F32)

        def sel_body(k, sc):
            q_d = lax.argmax(sc[0, :], 0, jnp.int32)
            qk = jnp.where(bland, q_b, q_d)
            valid = (k < nelig) & ((~bland) | (k == jnp.int32(0)))
            q_safe = jnp.where(valid, jnp.minimum(qk, jnp.int32(n - 1)),
                               jnp.int32(0))
            qb8 = (q_safe // 8) * 8
            cdma = pltpu.make_async_copy(
                AT_hbm.at[pl.ds(qb8, 8), :],
                tilebuf.at[1, pl.ds(0, 8), :],
                rsem,
            )
            cdma.start()
            cdma.wait()
            rows8 = lax.broadcasted_iota(jnp.int32, (8, m), 0)
            acol = jnp.sum(
                jnp.where(rows8 == q_safe - qb8,
                          tilebuf[1, pl.ds(0, 8), :], ZERO),
                axis=0, keepdims=True,
            )                               # (1, m)
            candcols[...] = jnp.where(
                (rowKS == k) & valid,
                jnp.broadcast_to(acol, (K8, m)), candcols[...],
            )
            lane_k = lane128 == k
            cand_ids[...] = jnp.where(
                lane_k, jnp.where(valid, qk, jnp.int32(-1)), cand_ids[...]
            )
            d_cand[...] = jnp.where(
                lane_k, jnp.where(valid, sel_col(dcur, qk), ZERO), d_cand[...]
            )
            wts_cand[...] = jnp.where(
                lane_k, jnp.where(valid, sel_col(wts[...], qk), ONE),
                wts_cand[...],
            )
            vstat_cand[...] = jnp.where(
                lane_k,
                jnp.where(valid, sel_col(vstat, qk),
                          jnp.int32(VarStat.FIXED)),
                vstat_cand[...],
            )
            return jnp.where(col_ids == qk, neg_inf, sc)

        lax.fori_loop(0, minor_k, sel_body, score0)

        # ---- candidate tableau block W = (B⁻¹·candcols) ----------------------
        # ONE (K8, m)×(m, m) MXU contraction per major; minors then read
        # their FTRAN as a ROW of W and maintain W by a rank-1 update — no
        # per-minor (m, m)×(m, 1) matvec (VERDICT r3 #2: the kernel was
        # per-minor op-dispatch-bound, not bandwidth-bound).
        # W[k, i] = Σ_j candcols[k, j]·Binv[i, j] = (B⁻¹ a_k)[i]
        W[...] = lax.dot_general(
            candcols[...], Binv[...], (((1,), (1,)), ((), ())),
            preferred_element_type=F32,
        )
        # deferred-PFI eta ledger: minors do NOT touch Binv; each pivot
        # records its (composed) eta vector + leaving row, and the whole
        # batch folds into Binv with two MXU contractions after the minor
        # loop.  Zeroed rows are inert in the fold contraction.
        etas[...] = jnp.zeros((K8, m), F32)
        eta_rs[...] = jnp.zeros((1, 128), F32)

        # ---- minor pivots on the cached candidate columns --------------------
        def minor_cond(mc):
            j, status, niter, noimp, fresh, sref, stop, wexit, n_eta = mc
            return ((j < jnp.int32(minor_k)) & (stop == 0)
                    & (status == Status.RUNNING) & (niter < max_iter))

        def minor_body(mc):
            j, status, niter, noimp, fresh, sref, stop, wexit, n_eta = mc
            loBv = loB[...]
            hiBv = hiB[...]
            xBv = xB[...]
            basis = basis_out[...]
            below = xBv < loBv - feas_tol
            above = xBv > hiBv + feas_tol
            cids = cand_ids[...]
            vc = vstat_cand[...]

            # candidate reduced costs: phase 2 maintains them exactly on the
            # (1, 128) lane vector; phase 1 recomputes them against the
            # current σ (state-dependent) — σᵀB⁻¹a_k = σ·W[k, :], one
            # (K8, m)×(m, 1) contraction on the maintained tableau block
            # (the round-3 kernel paid an (m, m) matvec here)
            @pl.when(p1)
            def _():
                ones_m = jnp.ones_like(xBv)
                sigma = jnp.where(below, -ones_m,
                                  jnp.where(above, ones_m, ZERO * ones_m))
                dK = lax.dot_general(
                    W[...], sigma, (((1,), (1,)), ((), ())),
                    preferred_element_type=F32,
                )                           # (K8, 1)
                d_cand[...] = -lax.dot_general(
                    dK, onehotK128, (((0,), (0,)), ((), ())),
                    preferred_element_type=F32,
                )                           # (1, 128)

            dc = jnp.where(vc == VarStat.BASIC, ZERO, d_cand[...])
            valid_c = cids >= jnp.int32(0)
            can_up_c = (vc == VarStat.AT_LOWER) | (vc == VarStat.FREE)
            can_dn_c = (vc == VarStat.AT_UPPER) | (vc == VarStat.FREE)
            elig_c = valid_c & (
                (can_up_c & (dc < -opt_tol)) | (can_dn_c & (dc > opt_tol))
            )
            found = jnp.sum(elig_c.astype(F32)) > ZERO

            # phase-1 pricing is unweighted (the major's score0 uses
            # gam=1 in phase 1); the minor must match or the decay exit
            # misfires into a zero-pivot major loop
            gam_c = jnp.where(p1, jnp.ones_like(wts_cand[...]),
                              wts_cand[...])
            score_c = jnp.where(
                elig_c,
                dc * dc / jnp.maximum(gam_c, ONE * devex_floor),
                neg_inf,
            )
            k_d = lax.argmax(score_c[0, :], 0, jnp.int32)
            # Bland entering: lowest ORIGINAL column index among eligible
            # candidates (f32-exact: ids < 2^24)
            k_b = lax.argmin(
                jnp.where(elig_c, cids, jnp.int32(n)).astype(F32)[0, :],
                0, jnp.int32,
            )
            # suboptimization exit: when the best remaining candidate's
            # score decays well below the major's top score, further minors
            # would pivot on mediocre columns — re-price at a major instead
            decayed = jnp.max(score_c) < best0 * jnp.float32(minor_decay)
            found = found & (~decayed | bland)
            ksel = jnp.where(bland, k_b, k_d)
            lane_sel = lane128 == ksel
            q = jnp.sum(jnp.where(lane_sel, cids, jnp.int32(0)))
            dq = jnp.sum(jnp.where(lane_sel, dc, ZERO))
            gq = jnp.maximum(
                jnp.sum(jnp.where(lane_sel, wts_cand[...], ZERO)), ONE
            )
            vq = jnp.sum(jnp.where(lane_sel, vc, jnp.int32(0)))
            s = jnp.where(dq < ZERO, jnp.float32(1.0), jnp.float32(-1.0))

            # FTRAN = a ROW READ of the maintained tableau block W (the
            # round-3 kernel did an (m, m)×(m, 1) Binv matvec per minor);
            # one masked (K8, m) reduce — K8·m VPU ops
            w = jnp.sum(
                jnp.where(rowKS == ksel, W[...], ZERO),
                axis=0, keepdims=True,
            )                               # (1, m)

            # ---- ratio test (identical to the megakernel) --------------------
            delta = -s * w
            up = delta > pivot_tol
            dn = delta < -pivot_tol
            up_tgt = jnp.where(below, loBv, hiBv)
            dn_tgt = jnp.where(above, hiBv, loBv)
            up_ok = ~above
            dn_ok = ~below
            tgt = jnp.where(up, up_tgt, jnp.where(dn, dn_tgt, ZERO))
            blockable = ((up & up_ok) | (dn & dn_ok)) & jnp.isfinite(tgt)
            ratio = jnp.where(
                blockable, (tgt - xBv) / jnp.where(up | dn, delta, ONE),
                jnp.float32(jnp.inf),
            )
            ratio = jnp.maximum(ratio, ZERO)
            t_rows = jnp.min(ratio)
            tie = ratio <= t_rows * jnp.float32(1.0001) + jnp.float32(1e-6)
            r_stab = lax.argmax(jnp.where(tie, jnp.abs(w), neg_inf)[0, :], 0,
                                jnp.int32)
            r_bland = lax.argmin(
                jnp.where(tie, basis, jnp.int32(n)).astype(F32)[0, :],
                0, jnp.int32,
            )
            r = jnp.where(bland, r_bland, r_stab)

            # ---- long-step phase-1 override (hostlp.py semantics) ----------
            # The first-breakpoint rule repairs ~one violation per pivot; the
            # phase-1 objective along the ray is piecewise-linear CONVEX, so
            # walk its slope to the crossing instead: a 22-step binary search
            # over the breakpoint times (two masked (1, m) sums per probe —
            # Mosaic has no sort) finds the event where the slope turns
            # non-negative; one pivot then crosses (and repairs) many
            # violated rows.  Results pass through lstmp lanes
            # [has_cross, t, r, tgt, active]; zeroed first so phase-2 minors
            # read an inert record.
            lstmp[...] = jnp.zeros((1, 128), F32)

            # `long_step` is STATIC (shape-conditional, set by the caller):
            # the piecewise-linear search pays off where phase 1 is tens of
            # thousands of pivots (maros scale) but cost ~25% wall at the
            # 25fv47 shape (round-3 chip measurement) — with long_step
            # False the whole block is never traced (zeroed lstmp keeps the
            # downstream lane reads inert; the Harris test stands alone).
            @pl.when(p1 & ~bland & found if long_step
                     else jnp.bool_(False))
            def _():
                sig = jnp.where(
                    below, -jnp.ones_like(xBv),
                    jnp.where(above, jnp.ones_like(xBv), ZERO * xBv),
                )
                slope0 = jnp.sum(sig * delta)
                inf32 = jnp.float32(jnp.inf)
                sdelta = jnp.where(up | dn, delta, ONE)
                e1_ok = (up & below) | (dn & above)
                e1_tgt = jnp.where(up, loBv, hiBv)
                e1_w = jnp.abs(jnp.where(e1_ok, delta, ZERO))
                e1_t = jnp.where(
                    e1_ok, jnp.maximum((e1_tgt - xBv) / sdelta, ZERO), inf32
                )
                e2_ok = ((up & ~above & jnp.isfinite(hiBv))
                         | (dn & ~below & jnp.isfinite(loBv)))
                e2_tgt = jnp.where(up, hiBv, loBv)
                e2_w = jnp.abs(jnp.where(e2_ok, delta, ZERO))
                e2_t = jnp.where(
                    e2_ok, jnp.maximum((e2_tgt - xBv) / sdelta, ZERO), inf32
                )
                tmax = jnp.maximum(
                    jnp.max(jnp.where(e1_ok, e1_t, -inf32)),
                    jnp.max(jnp.where(e2_ok, e2_t, -inf32)),
                )

                def g_at(tt):
                    return (slope0
                            + jnp.sum(jnp.where(e1_t <= tt, e1_w, ZERO))
                            + jnp.sum(jnp.where(e2_t <= tt, e2_w, ZERO)))

                has_cross = ((slope0 < ZERO) & jnp.isfinite(tmax)
                             & (g_at(tmax) >= ZERO))

                def emit(tl, th):
                    """Pick the leaving event inside (tl, th] (stability
                    tie-break: largest |delta|) and write the lane record."""
                    c1 = (e1_t > tl) & (e1_t <= th)
                    c2 = (e2_t > tl) & (e2_t <= th)
                    s1 = jnp.where(c1, jnp.abs(delta), neg_inf)
                    s2 = jnp.where(c2, jnp.abs(delta), neg_inf)
                    r1 = lax.argmax(s1[0, :], 0, jnp.int32)
                    r2 = lax.argmax(s2[0, :], 0, jnp.int32)
                    use2 = jnp.max(s2) > jnp.max(s1)
                    r_ls = jnp.where(use2, r2, r1)
                    t_ls = jnp.where(use2, sel_row(e2_t, r_ls),
                                     sel_row(e1_t, r_ls))
                    tgt_ls = jnp.where(use2, sel_row(e2_tgt, r_ls),
                                       sel_row(e1_tgt, r_ls))
                    out = jnp.where(lane128 == 0,
                                    jnp.where(has_cross, ONE, ZERO), ZERO)
                    out = jnp.where(lane128 == 1, t_ls, out)
                    out = jnp.where(lane128 == 2, r_ls.astype(F32), out)
                    out = jnp.where(lane128 == 3, tgt_ls, out)
                    out = jnp.where(lane128 == 4,
                                    jnp.where(slope0 < ZERO, ONE, ZERO), out)
                    lstmp[...] = out

                # first-breakpoint probe: when the slope already turns
                # non-negative at the earliest event (degenerate/late phase
                # 1 — the common case), the crossing IS that event and the
                # 22-probe search is skipped (chip-measured: the probes cost
                # ~25% of the 25fv47 wall when run unconditionally)
                t_min = jnp.minimum(jnp.min(e1_t), jnp.min(e2_t))
                need = has_cross & (g_at(t_min) < ZERO)
                emit(jnp.float32(-1.0), t_min)

                @pl.when(need)
                def _():
                    def bs(_i, tl_th):
                        tl, th = tl_th
                        mid = jnp.float32(0.5) * (tl + th)
                        g = g_at(mid)
                        return (jnp.where(g >= ZERO, tl, mid),
                                jnp.where(g >= ZERO, mid, th))

                    tl, th = lax.fori_loop(
                        0, 22, bs,
                        (jnp.float32(-1.0),
                         jnp.where(jnp.isfinite(tmax), tmax, ZERO)),
                    )
                    emit(tl, th)

            lsv = lstmp[...]
            ls_active = jnp.sum(jnp.where(lane128 == 4, lsv, ZERO)) > ZERO
            ls_cross = jnp.sum(jnp.where(lane128 == 0, lsv, ZERO)) > ZERO
            ls_t = jnp.sum(jnp.where(lane128 == 1, lsv, ZERO))
            ls_r = jnp.sum(jnp.where(lane128 == 2, lsv, ZERO)).astype(jnp.int32)
            ls_tgt = jnp.sum(jnp.where(lane128 == 3, lsv, ZERO))
            t_rows = jnp.where(
                ls_active,
                jnp.where(ls_cross, ls_t, jnp.float32(jnp.inf)), t_rows,
            )
            r = jnp.where(ls_active & ls_cross, ls_r, r)

            lo_q = sel_col(lo, q)
            hi_q = sel_col(hi, q)
            rng_q = hi_q - lo_q
            flip = rng_q <= t_rows
            unbounded = ~jnp.isfinite(jnp.minimum(t_rows, rng_q))
            t = jnp.where(
                flip, rng_q,
                jnp.where(ls_active & ls_cross, ls_t, sel_row(ratio, r)),
            )

            do_pivot = found & ~flip & ~unbounded
            do_flip = found & flip & ~unbounded

            enter_base = jnp.where(
                (vq == VarStat.AT_LOWER) | (vq == VarStat.FIXED), lo_q,
                jnp.where(vq == VarStat.AT_UPPER, hi_q, ZERO),
            )
            lv = sel_row(basis, r)
            loB_r = sel_row(loBv, r)
            hiB_r = sel_row(hiBv, r)
            tgt_r = jnp.where(ls_active & ls_cross, ls_tgt,
                              sel_row(tgt, r))
            lstat = jnp.where(
                loB_r == hiB_r, jnp.int32(VarStat.FIXED),
                jnp.where(tgt_r == hiB_r, jnp.int32(VarStat.AT_UPPER),
                          jnp.int32(VarStat.AT_LOWER)),
            )

            # bound flip
            vstat = vstat_out[...]
            xB_flip = xBv + t * delta
            vstat_flip = jnp.where(
                col_ids == q,
                jnp.where(vstat == VarStat.AT_LOWER,
                          jnp.int32(VarStat.AT_UPPER),
                          jnp.int32(VarStat.AT_LOWER)),
                vstat,
            )

            # ---- pivot: deferred PFI + maintained state ---------------------
            # No Binv reads or writes in a minor: the pivot row over the
            # CANDIDATES is column r of W (alpha_c below), the inverse
            # update is recorded as a composed eta and folded after the
            # minor loop, and W itself takes the rank-1 PFI directly.
            onehot_r = (row_ids == r).astype(F32)
            wr = sel_row(w, r)
            wr_safe = jnp.where(wr == ZERO, ONE, wr)
            x_enter = enter_base + s * t
            xB_piv = jnp.where(row_ids == r, x_enter, xBv + t * delta)
            basis_piv = jnp.where(row_ids == r, q, basis)
            vstat_piv = jnp.where(col_ids == lv, lstat, vstat)
            vstat_piv = jnp.where(col_ids == q, jnp.int32(VarStat.BASIC),
                                  vstat_piv)
            loB_piv = jnp.where(row_ids == r, lo_q, loBv)
            hiB_piv = jnp.where(row_ids == r, hi_q, hiBv)
            cB_piv = jnp.where(row_ids == r, sel_col(c, q), cB[...])

            xB[...] = jnp.where(do_pivot, xB_piv,
                                jnp.where(do_flip, xB_flip, xBv))
            basis_out[...] = jnp.where(do_pivot, basis_piv, basis)
            vstat_out[...] = jnp.where(
                do_pivot, vstat_piv, jnp.where(do_flip, vstat_flip, vstat)
            )
            loB[...] = jnp.where(do_pivot, loB_piv, loBv)
            hiB[...] = jnp.where(do_pivot, hiB_piv, hiBv)
            cB[...] = jnp.where(do_pivot, cB_piv, cB[...])

            # candidate-state maintenance: exact d/Devex updates on the
            # (1, 128) lane vectors.  α over the candidates = the pivot row
            # of B⁻¹·candcols = COLUMN r of W — a masked (K8, m) reduce +
            # the K8→128 lane adapter (the round-3 kernel paid an
            # (1, m)×(m, 128) MXU product after an (m, m) pivot-row matvec)
            rd = dq / wr_safe
            Wcol_r = jnp.sum(
                jnp.where(colKS == r, W[...], ZERO),
                axis=1, keepdims=True,
            )                               # (K8, 1) = (B⁻¹ a_k)[r] per k
            alpha_c = lax.dot_general(
                Wcol_r, onehotK128, (((0,), (0,)), ((), ())),
                preferred_element_type=F32,
            )                               # (1, 128)

            @pl.when(do_pivot)
            def _():
                dc2 = d_cand[...] - rd * alpha_c
                dc2 = jnp.where(cids == q, ZERO, dc2)
                dc2 = jnp.where(cids == lv, -rd, dc2)
                d_cand[...] = dc2
                tc = alpha_c / wr_safe
                wc = jnp.maximum(wts_cand[...], (tc * tc) * gq)
                wc = jnp.where(
                    cids == lv,
                    jnp.maximum(gq / (wr_safe * wr_safe), ONE), wc,
                )
                wc = jnp.where(cids == q, ONE, wc)
                wc = jnp.where(gq > jnp.float32(devex_reset),
                               jnp.ones_like(wc), wc)
                wts_cand[...] = wc
                vstat_cand[...] = jnp.where(
                    cids == lv, lstat,
                    jnp.where(cids == q, jnp.int32(VarStat.BASIC), vc),
                )
                # loose full-weight sync (the next major's candidate
                # selection reads wts; non-candidate growth stays stale —
                # "stale Devex", corrected when a column becomes a candidate)
                wfull = wts[...]
                wfull = jnp.where(
                    col_ids == lv,
                    jnp.maximum(gq / (wr_safe * wr_safe), ONE), wfull,
                )
                wfull = jnp.where(col_ids == q, ONE, wfull)
                # a reset event must clear the FULL vector too, or the next
                # major's candidate selection scores with inconsistently
                # scaled weights (ADVICE r3)
                wfull = jnp.where(gq > jnp.float32(devex_reset),
                                  jnp.ones_like(wfull), wfull)
                wts[...] = wfull

            @pl.when(do_flip)
            def _():
                vstat_cand[...] = jnp.where(
                    cids == q,
                    jnp.where(vc == VarStat.AT_LOWER,
                              jnp.int32(VarStat.AT_UPPER),
                              jnp.int32(VarStat.AT_LOWER)),
                    vc,
                )

            @pl.when(do_pivot)
            def _():
                # W rank-1 PFI: W_new[k,:] = W[k,:] − (W[k,r]/w_r)(w − e_r)
                # — the same eta transform the inverse will take at fold
                # time, applied to the (K8, m) block directly
                g_row = (w - onehot_r) / wr_safe       # (1, m) eta vector
                W[...] = W[...] - jnp.dot(
                    Wcol_r, g_row, preferred_element_type=F32
                )
                # eta ledger: compose the new eta into the stored ones
                # (g̃_j ← g̃_j − (g̃_j)_r·g_new, zero rows stay zero), then
                # record g_new at sublane n_eta and its leaving row on the
                # lane record
                etacol_r = jnp.sum(
                    jnp.where(colKS == r, etas[...], ZERO),
                    axis=1, keepdims=True,
                )                                      # (K8, 1)
                etas[...] = jnp.where(
                    rowKS == n_eta,
                    jnp.broadcast_to(g_row, (K8, m)),
                    etas[...] - jnp.dot(
                        etacol_r, g_row, preferred_element_type=F32
                    ),
                )
                eta_rs[...] = jnp.where(
                    lane128 == n_eta, r.astype(F32), eta_rs[...]
                )
                basis_smem[r] = q

            # ---- minor status/progress accounting ---------------------------
            # an UNBOUNDED claim additionally requires primal feasibility to
            # the drift floor: with materially violated basics the extended
            # ratio test legitimately finds no blocker (rows moving away
            # from a violated bound never block) without the LP being
            # unbounded — that state belongs to phase-1 repair (regression)
            viol_m = (jnp.maximum(loBv - xBv, ZERO)
                      + jnp.maximum(xBv - hiBv, ZERO))
            feas_m = jnp.sum(
                (viol_m > jnp.float32(regress_tol)).astype(F32)
            ) == ZERO
            believe = (fresh == 1) & (p1 | feas_m)
            status = jnp.where(
                found & unbounded & believe,
                jnp.where(p1, jnp.int32(Status.NUMERICAL),
                          jnp.int32(Status.UNBOUNDED)),
                status,
            )
            wexit = jnp.where(found & unbounded & ~believe,
                              jnp.int32(1), wexit)
            applied = found & ~unbounded
            fresh = jnp.where(applied, jnp.int32(0), fresh)
            niter = niter + jnp.where(applied, jnp.int32(1), jnp.int32(0))
            sref = sref + jnp.where(applied, jnp.int32(1), jnp.int32(0))
            n_eta = n_eta + jnp.where(do_pivot, jnp.int32(1), jnp.int32(0))
            # stall tracking (round-5 rework of the round-4 maros freeze):
            # a step is degenerate when its actual MOVEMENT t·‖Δ‖∞ is
            # negligible RELATIVE to the iterate scale — the old absolute
            # threshold (t ≤ 1e-9) let a near-degenerate long-step cycle
            # with t ≈ 1e-6 reset noimp forever, so Bland never engaged and
            # phase 1 froze on hardware (CHIP_LOG_r04.md post-mortem).  In
            # phase 1, noimp counts EVERY pivot here and only the MAJOR
            # loop resets it — on measured infeasibility progress — so
            # step-size games cannot defeat the anti-cycling trigger at
            # all; phase 2 keeps per-step accounting with the relative
            # degeneracy test.
            move = t * jnp.max(jnp.abs(w))
            xb_scale = jnp.max(jnp.abs(xBv))
            degenerate = applied & (
                move <= jnp.float32(1e-7) * (ONE + xb_scale)
            )
            noimp = jnp.where(
                applied,
                jnp.where(p1, noimp + 1,
                          jnp.where(degenerate, noimp + 1, jnp.int32(0))),
                noimp,
            )
            # exit minors: candidates exhausted/ineligible, unbounded ray,
            # refresh due (bounds f32 drift), or Bland active (full
            # re-pricing every pivot keeps anti-cycling exact)
            stop = jnp.where(
                (~found) | unbounded | (sref >= jnp.int32(refactor_period))
                | bland,
                jnp.int32(1), stop,
            )
            return (j + 1, status, niter, noimp, fresh, sref, stop, wexit,
                    n_eta)

        init_minor = (
            jnp.int32(0), status, niter, noimp, fresh, sref,
            jnp.int32(0), jnp.int32(0), jnp.int32(0),
        )
        (_j, status, niter, noimp, fresh, sref, _stop, wexit,
         n_eta) = lax.while_loop(minor_cond, minor_body, init_minor)

        # ---- fold the deferred etas into Binv --------------------------------
        # Binv_new = E_K···E_1·Binv = Binv − Σ_j g̃_j ⊗ Binv[r_j, :] with the
        # g̃_j already composed in the ledger.  Two MXU contractions: P =
        # onehot(r_j)·Binv gathers the pivot rows, then each row-tile takes
        # (K8, tb)ᵀ(K8, m).  Replaces K8 serialized per-minor rank-1 PFI
        # passes (the round-3 kernel's largest per-minor op) with one
        # batched update per major.
        @pl.when(n_eta > jnp.int32(0))
        def _():
            rs_col = lax.dot_general(
                onehotK128, eta_rs[...], (((1,), (1,)), ((), ())),
                preferred_element_type=F32,
            )                                          # (K8, 1)
            ohR = (colKS == rs_col.astype(jnp.int32)).astype(F32)
            # rows ≥ n_eta: eta rows are zero ⇒ inert in the contraction,
            # whatever P holds there
            Pbuf[...] = jnp.dot(ohR, Binv[...], preferred_element_type=F32)

            def fold_tile(tt, _):
                sl = pl.ds(tt * tb, tb)
                et = etas[:, sl]                       # (K8, tb)
                Binv[sl, :] = Binv[sl, :] - lax.dot_general(
                    et, Pbuf[...], (((0,), (0,)), ((), ())),
                    preferred_element_type=F32,
                )
                return 0

            lax.fori_loop(0, m_tiles, fold_tile, 0)

        # ---- phase-1 progress accounting (the noimp reset authority) ---------
        # minors only INCREMENT noimp in phase 1 (see minor_body); the reset
        # happens here, on measured total-infeasibility progress across the
        # major — the accounting the round-4 freeze post-mortem called for:
        # a cycle whose tiny-but-nonzero steps repair nothing can no longer
        # hold Bland off.
        xB_post = xB[...]
        inf_now = jnp.sum(
            jnp.maximum(loB[...] - xB_post, ZERO)
            + jnp.maximum(xB_post - hiB[...], ZERO)
        )
        p1_improved = inf_now < best_inf - jnp.float32(1e-6) * (ONE + best_inf)
        noimp = jnp.where(p1 & p1_improved, jnp.int32(0), noimp)
        best_inf = jnp.where(p1, jnp.minimum(best_inf, inf_now), best_inf)

        # ---- major terminal claims (only from fresh state) -------------------
        believe = fresh == 1
        status = jnp.where(
            (~found_any) & believe & (status == Status.RUNNING),
            jnp.where(p1, jnp.int32(Status.INFEASIBLE),
                      jnp.int32(Status.OPTIMAL)),
            status,
        )
        force = jnp.where(
            ((~found_any) | (wexit == 1)) & ~believe
            & (status == Status.RUNNING),
            jnp.int32(1), jnp.int32(0),
        )
        status = jnp.where(diverged, jnp.int32(Status.NUMERICAL), status)
        return (status, niter, phase, noimp, fresh, force, sref, best_inf)

    # warm restarts distrust the handed-in (f32-cast) inverse: fresh=0 forces
    # a Newton refresh before any terminal claim is believed
    init = (
        jnp.int32(Status.RUNNING), jnp.int32(0), jnp.int32(1),
        jnp.int32(0), jnp.int32(0 if warm else 1), jnp.int32(0),
        jnp.int32(0), jnp.float32(jnp.inf),
    )
    status, niter, phase_f, *_rest = lax.while_loop(cond, body, init)
    status = jnp.where(
        status == Status.RUNNING, jnp.int32(Status.MAX_ITER), status
    )
    status_out[...] = jnp.reshape(status, (1, 1))
    niter_out[...] = jnp.reshape(niter, (1, 1))
    # progress telemetry for the chunk driver: phase + remaining primal
    # infeasibility (how far phase 1 still has to go)
    phase_out[...] = jnp.reshape(phase_f, (1, 1))
    infeas_f = jnp.sum(
        jnp.maximum(loB[...] - xB[...], ZERO)
        + jnp.maximum(xB[...] - hiB[...], ZERO)
    )
    infeas_out[...] = jnp.reshape(infeas_f, (1, 1))
    # claimed objective c·x (f32 estimate) — the chunk driver's surrender
    # logic keys on JOINT infeasibility + objective stagnation, so a chunk
    # that is still improving the objective is never surrendered on
    v_f = vstat_out[...]
    xn_f = jnp.where(v_f == VarStat.AT_LOWER, lo, ZERO)
    xn_f = jnp.where(v_f == VarStat.AT_UPPER, hi, xn_f)
    xn_f = jnp.where(v_f == VarStat.FIXED, lo, xn_f)
    xn_f = jnp.where(v_f == VarStat.BASIC, ZERO, xn_f)
    obj_f = jnp.sum(cB[...] * xB[...]) + jnp.sum(c * xn_f)
    obj_out[...] = jnp.reshape(obj_f, (1, 1))
    # export the maintained inverse: the chunked-launch driver feeds it back
    # as the next launch's warm seed (device-resident, no host round-trip)
    bout = pltpu.make_async_copy(Binv, Binv_out, rsem)
    bout.start()
    bout.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "slack0", "tile_n", "tile_m", "max_iter", "refactor_period",
        "newton_sweeps", "feas_tol", "opt_tol", "pivot_tol", "bland_after",
        "devex_floor", "devex_reset", "minor_k", "regress_tol",
        "se_weights", "minor_decay", "xb_refine", "long_step", "interpret",
        "b_resident",
    ),
)
def stream_kernel_call(
    AT32, b32, c32, lo32, hi32, *warm_args,
    slack0, tile_n, tile_m, max_iter, refactor_period, newton_sweeps,
    feas_tol, opt_tol, pivot_tol, bland_after, devex_floor, devex_reset,
    minor_k, regress_tol, se_weights, minor_decay, xb_refine, interpret,
    long_step=True, b_resident=False,
):
    n, m = AT32.shape
    warm = bool(warm_args)
    # candidate-block sublane count: minor_k rounded up to the 8-sublane
    # tile (the W/eta/candcols buffers are (K8, m); lane RECORDS stay
    # (1, 128) — the minimum lane tile)
    K8 = max(8, -(-int(minor_k) // 8) * 8)
    kern = functools.partial(
        _stream_kernel, m=m, n=n, slack0=slack0, tile_n=tile_n,
        tile_m=tile_m,
        max_iter=max_iter, refactor_period=refactor_period,
        newton_sweeps=newton_sweeps, feas_tol=feas_tol, opt_tol=opt_tol,
        pivot_tol=pivot_tol, bland_after=bland_after,
        devex_floor=devex_floor, devex_reset=devex_reset, minor_k=minor_k,
        regress_tol=regress_tol, se_weights=se_weights,
        minor_decay=minor_decay, xb_refine=xb_refine, long_step=long_step,
        warm=warm, b_resident=b_resident,
    )
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    warm_specs = (
        [vspec(), vspec(), pl.BlockSpec(memory_space=pl.ANY)]
        if warm else []
    )
    return pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # AT stays in HBM
            vspec(), vspec(), vspec(), vspec(),
            *warm_specs,
        ],
        out_specs=[
            vspec(), vspec(), vspec(), vspec(),
            pl.BlockSpec(memory_space=pl.ANY),   # HBM staging scratch
            pl.BlockSpec(memory_space=pl.ANY),   # Binv (chunk warm seed)
            vspec(), vspec(), vspec(),               # phase, infeas, obj
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, m), jnp.int32),   # basis
            jax.ShapeDtypeStruct((1, n), jnp.int32),   # vstat
            jax.ShapeDtypeStruct((1, 1), jnp.int32),   # status
            jax.ShapeDtypeStruct((1, 1), jnp.int32),   # niter
            # HBM staging: the resident-Bᵀ refresh only needs the X' slot
            jax.ShapeDtypeStruct((1 if b_resident else 3, m, m), F32),
            jax.ShapeDtypeStruct((m, m), F32),         # Binv out
            jax.ShapeDtypeStruct((1, 1), jnp.int32),   # phase
            jax.ShapeDtypeStruct((1, 1), F32),         # primal infeasibility
            jax.ShapeDtypeStruct((1, 1), F32),         # claimed objective
        ],
        scratch_shapes=[
            pltpu.VMEM((m, m), F32),        # Binv
            pltpu.VMEM((1, m), F32),        # xB
            pltpu.VMEM((1, n), F32),        # d
            pltpu.VMEM((1, m), F32),        # loB
            pltpu.VMEM((1, m), F32),        # hiB
            pltpu.VMEM((1, m), F32),        # cB
            pltpu.VMEM((1, n), F32),        # Devex weights
            pltpu.VMEM((1, n), F32),        # d1 (phase-1 composite)
            pltpu.VMEM((K8, m), F32),       # W = (B⁻¹·candcols)ᵀ rows
            pltpu.VMEM((K8, m), F32),       # composed eta vectors (deferred PFI)
            pltpu.VMEM((K8, m), F32),       # candidate Aᵀ columns (cached)
            pltpu.VMEM((1, 128), jnp.int32),  # candidate column ids
            pltpu.VMEM((1, 128), F32),      # candidate reduced costs
            pltpu.VMEM((1, 128), F32),      # candidate Devex weights
            pltpu.VMEM((1, 128), jnp.int32),  # candidate statuses
            pltpu.VMEM((1, 128), F32),      # long-step result lanes
            pltpu.VMEM((1, 128), F32),      # eta leaving-row ids (f32-exact)
            pltpu.VMEM((K8, m), F32),       # P = Binv rows at eta pivots (fold)
            pltpu.VMEM((1, m), F32),        # b_eff stash (xB refinement)
            pltpu.VMEM((2, max(tile_n, tile_m), m), F32),  # Aᵀ tile dbl buffer
            pltpu.VMEM((max(tile_n, tile_m), m), F32),  # general tile temp
            pltpu.SMEM((m,), jnp.int32),    # basis (scalar-indexable)
            pltpu.SMEM((1,), F32),          # Newton divergence telltale
            pltpu.SemaphoreType.DMA((2,)),  # tile-buffer semaphores
            pltpu.SemaphoreType.DMA(()),    # row/bulk semaphore
            *([pltpu.VMEM((m, m), F32)] if b_resident else []),  # resident Bᵀ
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(120 if b_resident else 112) * 1024 * 1024,
        ),
        interpret=interpret,
    )(AT32, b32, c32, lo32, hi32, *warm_args)


def solve_streaming_pallas(
    A, b, c, lo, hi,
    *,
    slack0: int | None = None,
    tile_n: int = 512,
    max_iter: int = 50_000,
    refactor_period: int = 128,
    newton_sweeps: int = 2,
    feas_tol: float = 1e-5,
    opt_tol: float = 1e-6,
    pivot_tol: float = 1e-6,
    bland_after: int = 400,
    devex_floor: float = 1e-12,
    devex_reset: float = 1e8,
    minor_k: int = 16,
    regress_tol: float = 1e-3,
    se_weights: bool = True,
    minor_decay: float = 0.0625,
    xb_refine: bool = True,
    # long-step phase 1 re-enabled at m >= 2048 (round 5): the round-4
    # hardware freeze (a near-degenerate cycle whose t ~ 1e-6 steps defeated
    # the absolute 1e-9 degeneracy threshold, so noimp kept resetting and
    # Bland never engaged — CHIP_LOG_r04.md) is fixed at the accounting
    # level: phase-1 noimp now counts every pivot and only measured
    # infeasibility progress resets it (major loop), and degeneracy is
    # classified RELATIVE to the iterate scale (t.||w|| vs 1 + ||xB||).
    # Below 2048 the long step costs more than it saves (~25% wall at the
    # 25fv47 shape, round-3 chip measurement).
    long_step_min_m: int = 2048,
    b_resident: bool | None = None,
    interpret: bool = False,
    warm_state=None,
    chunk_iters: int | str | None = "auto",
    progress: bool = False,
) -> PallasStreamResult:
    """Solve ONE canonical LP with A streamed from HBM (module docstring).

    m must be a multiple of 8 (canonical row_align; 128 on hardware — the
    driver pads).  n is padded here to a multiple of `tile_n` with inert
    FIXED columns (zero A column, lo=hi=0 — the canonical.py invariant:
    FIXED is never eligible to enter).  The refresh sweeps tile the
    m-dimension separately with `tile_m` = the largest 128-multiple divisor
    of m (8-multiple in interpreter mode).

    `warm_state=(basis0 (m,) int, vstat0 (n,) int, Binv0 (m, m))` restarts
    from that state instead of the slack basis — the incremental API's warm
    restart at Netlib scale (SURVEY.md §4.2); the maintained inverse is the
    Newton seed and a refresh precedes any terminal claim.

    `chunk_iters` bounds the pivots PER KERNEL LAUNCH: the solve relaunches
    warm from the previous launch's DEVICE-resident (basis, vstat, B⁻¹)
    outputs — no host round-trips — until a terminal status or `max_iter`
    total pivots.  This keeps each launch's device time to a few seconds:
    measured on this machine, single executions beyond ~1 minute FAULT the
    axon TPU worker (the same failure mode that killed the maros-scale XLA
    graphs; CLAUDE.md gotchas).  None → one unbounded launch.  Chunking
    applies in interpreter mode too (the chunked-vs-single gate relies on
    it).
    """
    import numpy as np

    m, n = A.shape
    if slack0 is None:
        slack0 = n - m
    if not (1 <= minor_k <= 128):
        raise ValueError(f"minor_k={minor_k} must be in [1, 128]")
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        pad = n_pad - n
        A = np.concatenate([np.asarray(A), np.zeros((m, pad), A.dtype)], axis=1)
        c = np.concatenate([np.asarray(c), np.zeros(pad, np.asarray(c).dtype)])
        lo = np.concatenate([np.asarray(lo), np.zeros(pad)])
        hi = np.concatenate([np.asarray(hi), np.zeros(pad)])
    if warm_state is not None:
        basis0, vstat0, Binv0 = warm_state
        vstat0 = np.asarray(vstat0, dtype=np.int32)
        if vstat0.shape[0] != n_pad:  # tile padding columns are inert FIXED
            vstat0 = np.concatenate([
                vstat0,
                np.full(n_pad - vstat0.shape[0], int(VarStat.FIXED), np.int32),
            ])
        warm_args = (
            jnp.asarray(np.asarray(basis0, dtype=np.int32))[None, :],
            jnp.asarray(vstat0)[None, :],
            jnp.asarray(np.asarray(Binv0), dtype=F32),
        )
    else:
        warm_args = ()
    if m % 128 and not interpret:
        # m is the LANE dimension of every streamed tile (Aᵀ is (n, m)) and
        # Mosaic requires lane slices 128-aligned; the driver pads rows to
        # 128 with inert rows (zero row, b=0, slack basic at [0,0]) before
        # calling (driver._try_streaming_solve).  Interpreter mode has no
        # tiling constraint — small-shape CI gates run unpadded.
        raise ValueError(f"m={m} must be a multiple of 128 (TPU lane tiling)")
    if m % 8:
        raise ValueError(f"m={m} must be a multiple of 8 (canonical row_align)")
    # tile_m doubles as a LANE offset in the refresh's H build (columns of
    # the staged m×m products), so on hardware it must be a multiple of 128:
    # largest 128-multiple divisor of m that fits the tile buffer.  In
    # interpreter mode (small CI shapes, m < 128) fall back to 8-multiples.
    tile_m = 0
    step = 128 if m % 128 == 0 else 8
    for dcand in range(min(tile_n, m) - min(tile_n, m) % step, step - 1, -step):
        if m % dcand == 0:
            tile_m = dcand
            break
    if tile_m == 0:
        raise ValueError(f"m={m} has no {step}-aligned tile divisor")
    if b_resident is None:
        # auto: keep Bᵀ resident in VMEM through the Newton refresh whenever
        # BOTH m² buffers fit with a large reserve — cuts per-sweep refresh
        # HBM traffic from ~(m/tile_m + 4)·m² to 2·m² (VERDICT r4 #3b).
        # The reserve is for Mosaic register-allocator SPILL SLOTS, which
        # the budget formula cannot see: chip-measured at the maros shape
        # (m=3200, long-step on), the kernel needs 42 MB of spills on top of
        # the 2×39 MB buffers and blows the 128 MB core (140.2 MB requested
        # — compile log, round 5).  48 MB for the two m² buffers leaves
        # ~70 MB for tiles + vectors + spills at every accepted shape.
        b_resident = 8 * m * m <= 48 * 1024 * 1024

    from ...utils import profiling as _prof

    with _prof.stage("stream_prep_s"):
        # host transpose + device upload of Aᵀ (MBs over the tunnel): a real
        # cold-wall term, attributed separately from the first launch
        f32 = lambda x: jnp.asarray(np.asarray(x), dtype=F32)
        AT32 = jnp.asarray(np.ascontiguousarray(np.asarray(A, np.float32).T))
        vec_args = (f32(b)[None, :], f32(c)[None, :],
                    f32(lo)[None, :], f32(hi)[None, :])
    if chunk_iters == "auto":
        # Watchdog-safe by measured rate (~15k pivots/s at m≈896): at mid
        # sizes a 32k-pivot launch is ~2-4 s of device time, so most solves
        # finish in ONE launch and never load the warm-restart executable
        # (a separate jit signature whose one-time cached-binary load cost
        # ~15 s of the 25fv47 cold wall).  Larger shapes keep short chunks:
        # per-pivot cost grows with the O(m³) refresh share.
        chunk_iters = 32768 if m <= 1024 else 8192
    chunk = max_iter if chunk_iters is None else min(int(chunk_iters), max_iter)
    total_iter = 0
    surrender = False
    tracker = SurrenderTracker(feas_tol)
    from ...utils import profiling

    first_launch = True
    with jax.enable_x64(False), jax.default_matmul_precision("highest"):
        while True:
            t_launch = time.perf_counter()
            out = stream_kernel_call(
                AT32, *vec_args, *warm_args,
                slack0=slack0, tile_n=tile_n, tile_m=int(tile_m),
                max_iter=chunk,
                refactor_period=refactor_period, newton_sweeps=newton_sweeps,
                feas_tol=feas_tol, opt_tol=opt_tol, pivot_tol=pivot_tol,
                bland_after=bland_after, devex_floor=devex_floor,
                devex_reset=devex_reset, minor_k=minor_k,
                regress_tol=regress_tol, se_weights=se_weights,
                minor_decay=minor_decay, xb_refine=xb_refine,
                long_step=bool(m >= long_step_min_m),
                b_resident=bool(b_resident),
                interpret=interpret,
            )
            # One batched transfer for the chunk monitor scalars.  Device-side
            # indexing (`out[i][0, 0]`) would dispatch a compiled slice/squeeze
            # executable per read — on this remote-attached backend each FIRST
            # such dispatch is a ~0.3-1.2 s remote compile (cProfile-measured:
            # 5.7 s of a 28.8 s cold 25fv47 solve went to exactly this).
            niter_a, st_a, ph_a, inf_a, obj_a = jax.device_get(
                (out[3], out[2], out[6], out[7], out[8])
            )
            total_iter += int(niter_a[0, 0])
            # stage attribution: the first launch carries compile /
            # compile-cache-load / first-DMA-chain overhead; later chunks are
            # steady-state device time (bench.py's maros breakdown)
            profiling.record_stage(
                "stream_first_launch_s" if first_launch
                else "stream_chunks_s",
                time.perf_counter() - t_launch,
            )
            profiling.bump_stage("stream_n_chunks")
            first_launch = False
            st = int(st_a[0, 0])
            ph = int(ph_a[0, 0])
            inf_now = float(inf_a[0, 0])
            obj_now = float(obj_a[0, 0])
            if progress:
                print(
                    f"[stream chunk] total_iter={total_iter} status={st} "
                    f"phase={ph} infeas={inf_now:.3e} obj={obj_now:.6e}",
                    flush=True,
                )
            if st != int(Status.MAX_ITER) or total_iter >= max_iter:
                break
            if tracker.update(ph, inf_now, obj_now):
                surrender = True
                break
            # relaunch warm from the device-resident state of this chunk
            warm_args = (out[0], out[1], out[5])
    # host-side slicing of fetched arrays — device-side `out[0][0]` would
    # dispatch another compiled slice executable per array (see above)
    basis = np.asarray(out[0])[0]
    vstat = np.asarray(out[1])[0]
    status = np.int32(Status.NUMERICAL) if surrender else np.int32(st)
    niter = np.int32(total_iter)
    t_verify = time.perf_counter()
    obj, verified, x = _verify_f64(
        np.asarray(A, np.float64)[None], np.asarray(b, np.float64)[None],
        np.asarray(c, np.float64)[None], np.asarray(lo, np.float64)[None],
        np.asarray(hi, np.float64)[None],
        np.asarray(basis)[None], np.asarray(vstat)[None],
        np.asarray(status)[None],
    )
    profiling.record_stage("stream_verify_s", time.perf_counter() - t_verify)
    # strip the inert tile-padding columns from the caller-facing arrays
    return PallasStreamResult(
        basis=basis, vstat=vstat[:n], status=status, niter=niter,
        obj=obj[0], verified=verified[0], x=x[0][:n],
    )
