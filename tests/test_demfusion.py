"""FFT DEM fusion: the quantized separable circular-convolution plan
must track the reference's direct FFT path (elevation.fft_dem_fusion)
within the documented kernel-quantization bound, and be exactly
partition-independent."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.stages.demfusion import (
    fft_dem_fusion,
    fft_fusion_reference,
)

N, CS = 32, 4


def _fixture():
    p = np.arange(N * N, dtype=np.int64)
    r, c = np.divmod(p, N)
    base = 50 + (r * r + 2 * c * c) // 40
    hi = base + (p * 37) % 21 - 10
    lo = base + (p * 53) % 15 - 7
    return pa.table({"row": r, "col": c, "hi": hi, "lo": lo}), hi, lo


def test_fusion_tracks_fft_reference(ray_session):
    t, hi, lo = _fixture()
    out = (
        fft_dem_fusion(ray.data.from_arrow(t).repartition(4), N, CS)
        .to_pandas()
        .sort_values(["row", "col"])
    )
    got = out["fused_u"].to_numpy() / 1e6
    ref = fft_fusion_reference(
        hi.reshape(N, N), lo.reshape(N, N), CS
    ).ravel()
    assert np.abs(got - ref).max() < 1e-3


def test_fusion_partition_independent(ray_session):
    t, _, _ = _fixture()
    outs = []
    for parts in (2, 9):
        outs.append(
            fft_dem_fusion(
                ray.data.from_arrow(t).repartition(parts), N, CS
            )
            .to_pandas()
            .sort_values(["row", "col"])
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_fusion_identity_when_dems_equal(ray_session):
    # hi == lo -> d == 0 -> fused == |lo| exactly
    p = np.arange(N * N, dtype=np.int64)
    r, c = np.divmod(p, N)
    v = 80 + (p * 7) % 13
    t = pa.table({"row": r, "col": c, "hi": v, "lo": v})
    out = (
        fft_dem_fusion(ray.data.from_arrow(t).repartition(3), N, CS)
        .to_pandas()
        .sort_values(["row", "col"])
    )
    assert np.array_equal(out["fused_u"].to_numpy(), v * 1000000)
