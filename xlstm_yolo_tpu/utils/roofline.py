"""Roofline / MFU analysis for the chunkwise mLSTM on TPU.

TPU re-derivation of the reference's roofline model
(ref:mlstm_kernels/utils/analysis/roofline_analysis/roofline_analysis_mlstm.py
and .../flops_mlstm.py): the reference models an H100 (FLOP/s vs HBM
GB/s); here the machine balance is the TPU's MXU peak vs HBM bandwidth,
and the derived quantity of interest is the chunk size where the
intra-chunk (L, L) work stops being memory-bound.

Also provides model-level MFU: achieved FLOP/s (XLA cost analysis of
the exact compiled program) over the chip's peak.
"""

from __future__ import annotations

from dataclasses import dataclass

# Peak numbers per chip. v5e ("TPU v5 lite"): 197 TFLOP/s bf16 MXU,
# 819 GB/s HBM (public spec).  v4: 275/1228.  Used for MFU and the
# roofline balance point only — measurement stays empirical.
CHIP_SPECS = {
    "v5e": {"peak_bf16_tflops": 197.0, "hbm_gbps": 819.0, "vmem_mb": 128.0},
    "v4": {"peak_bf16_tflops": 275.0, "hbm_gbps": 1228.0, "vmem_mb": 128.0},
    "v5p": {"peak_bf16_tflops": 459.0, "hbm_gbps": 2765.0, "vmem_mb": 128.0},
}


def detect_chip() -> str:
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
        if "v5 lite" in kind or "v5e" in kind:
            return "v5e"
        if "v5p" in kind or "v5" in kind:
            return "v5p"
        if "v4" in kind:
            return "v4"
    except Exception:
        pass
    return "v5e"


@dataclass
class ChunkwiseCost:
    """FLOPs and HBM bytes of one chunkwise-mLSTM forward call."""

    flops: float
    hbm_bytes: float
    intensity: float  # FLOPs / byte
    compute_s: float
    memory_s: float

    @property
    def bound(self) -> str:
        return "compute" if self.compute_s >= self.memory_s else "memory"


def mlstm_chunkwise_cost(
    B: int, NH: int, S: int, DHQK: int, DHHV: int, L: int,
    bytes_per_el: int = 2, chip: str | None = None,
) -> ChunkwiseCost:
    """Analytical cost of the fused chunkwise forward at chunk size L.

    FLOPs per (batch, head), NC = S/L chunks (matmuls dominate; the
    2x factor counts multiply+add):
      intra scores   S = Q K^T        : NC * 2 L^2 DHQK
      intra output   (S.D) V          : NC * 2 L^2 DHHV
      inter output   Qbar C           : NC * 2 L DHQK DHHV
      state update   Kbar^T V         : NC * 2 L DHQK DHHV
    HBM: q, k (S*DHQK), v, h (S*DHHV) read/written once — the fused
    kernel keeps (C, n) and all (L, L) transients in VMEM (the whole
    point vs the unfused scan, which spills them).
    """
    NC = -(-S // L)
    per_bh = NC * (2 * L * L * (DHQK + DHHV) + 4 * L * DHQK * DHHV)
    flops = B * NH * per_bh
    hbm = B * NH * (2 * S * DHQK + 2 * S * DHHV) * bytes_per_el
    spec = CHIP_SPECS[chip or detect_chip()]
    comp = flops / (spec["peak_bf16_tflops"] * 1e12)
    mem = hbm / (spec["hbm_gbps"] * 1e9)
    return ChunkwiseCost(flops, hbm, flops / hbm, comp, mem)


def optimal_chunk_size(
    S: int, DHQK: int, DHHV: int, chip: str | None = None,
    candidates=(64, 128, 256, 400, 512, 1024),
) -> int:
    """Smallest chunk size whose modeled time is within 5% of the best.

    Larger L raises the O(L) intra-chunk FLOPs/token; smaller L raises
    the sequential chunk count (launch/pipeline overhead, not modeled)
    — so prefer the smallest L on the flat part of the curve.
    """
    times = {
        L: max(mlstm_chunkwise_cost(1, 1, S, DHQK, DHHV, L, chip=chip).compute_s,
               mlstm_chunkwise_cost(1, 1, S, DHQK, DHHV, L, chip=chip).memory_s)
        for L in candidates if L <= max(S, 64)
    }
    best = min(times.values())
    for L in sorted(times):
        if times[L] <= 1.05 * best:
            return L
    return min(times, key=times.get)


def chunk_size_table(stages=None, chip: str | None = None) -> list[dict]:
    """Roofline-justified chunk table for the flagship stages."""
    stages = stages or [  # vil-det-192 backbone/FPN sequence shapes
        (6400, 32, 32), (1600, 32, 32), (400, 32, 32), (100, 32, 32),
    ]
    rows = []
    for S, dqk, dhv in stages:
        cost512 = mlstm_chunkwise_cost(8, 12, S, dqk, dhv, min(512, S), chip=chip)
        rows.append({
            "S": S,
            "L_roofline": optimal_chunk_size(S, dqk, dhv, chip=chip),
            "intensity_at_512": round(cost512.intensity, 1),
            "bound": cost512.bound,
        })
    return rows


def model_mfu(sec_per_batch: float, flops_per_batch: float, chip: str | None = None) -> float:
    """Achieved FLOP/s over peak for the measured program."""
    spec = CHIP_SPECS[chip or detect_chip()]
    return flops_per_batch / max(sec_per_batch, 1e-12) / (spec["peak_bf16_tflops"] * 1e12)
