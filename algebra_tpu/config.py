"""Runtime configuration knobs (the reference's cargo features analogue:
`asm`/`parallel` become backend dispatch decisions made at trace time)."""

from __future__ import annotations

# None = auto: use Pallas kernels when the default backend is a TPU.
use_pallas: bool | None = None

# Minimum flattened batch size for the fused Pallas group-law/field
# kernels.  One fused kernel launch (~20-50 us, lanes padded up to the
# 128-lane block by pad_bucket) beats the composed jnp path (~600
# separate XLA ops, ~1 ms measured on [24, 16, 128] Jacobian adds) at
# ANY batch size on TPU — small batches dominate the latency-bound
# sequential regions (bucket-reduction scan, Horner fold, scalar-mul
# bit scans), so the fused path is unconditional there.
pallas_min_batch: int = 1

# MSM bucket accumulation strategy: the sorted-segment affine pairwise
# tree (batched chord/tangent adds with amortized blocked inversion,
# ~7 field muls per point) vs the lockstep Jacobian mixed-add rounds
# (~19 muls per point).  None = auto: tree on TPU (where the curve kind
# provides `affine_add`), lockstep on CPU — the tree's per-level batched
# inversions make XLA:CPU test compiles ~8x slower.
msm_affine_tree: bool | None = None


# Run Pallas kernels in interpret mode (XLA emulation) — lets the CPU
# test suite execute the kernel definitions themselves.
pallas_interpret: bool = False

# MSM planner cost model (seconds per unit), measured on v5e via
# exp/msm_phases.py + the round-5 c-sweep at 2^18 (NOTES.md).  Override
# for other hardware; the planner only uses RATIOS, so rough values are
# fine.
#   recode:  per window-point (signed digits + sort + tables)
#   slot:    per padded tree slot (unit-DMA expansion + halving levels
#            + lockstep, amortized; r5 redesign dropped this 115 -> 80)
#   bucket:  per (window, bucket): weighted reduction + expansion
#            metadata + lockstep-round sweeps (all B-proportional; the
#            r4 value 2e-7 underweighted these and picked c=16 at 2^18
#            where the measured best is c=14: 1.08 s vs 1.23 s)
msm_cost_recode: float = 36e-9
msm_cost_slot: float = 80e-9
msm_cost_bucket: float = 5.0e-7


def msm_affine_tree_enabled() -> bool:
    if msm_affine_tree is not None:
        return bool(msm_affine_tree)
    return pallas_enabled()


def pallas_enabled() -> bool:
    if use_pallas is not None:
        return bool(use_pallas)
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
