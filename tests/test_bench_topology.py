"""`devit bench --topology` (bench.measure_topology, VERDICT r3 #8): the one
command that verifies the multi-chip serving claim. On the 8-virtual-CPU-device
mesh the MEASURED branch runs parallel/serve.py for real; restricting to one
device exercises the PROJECTION branch (what the single-real-chip environment
prints). Both JSON schemas are pinned here so the driver artifact is stable."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

from devit_tpu.configs import get_vit_config  # noqa: E402
from devit_tpu.models.compact_vit import compact_vit_ragged  # noqa: E402
from devit_tpu.models.ensemble import EnsMLP  # noqa: E402
from devit_tpu.models.vit import Gates, VisionTransformer  # noqa: E402

CFG = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=64,
                     depth=2, num_heads=4, num_classes=9)


def _tiny(num_div=4):
    model = VisionTransformer(CFG, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    rng = np.random.default_rng(0)
    cms = []
    for d in range(num_div):
        params = model.init(jax.random.key(d), x)["params"]
        head = np.zeros((2, 4), np.float32)
        neuron = np.zeros((2, 256), np.float32)
        for l, (hk, nk) in enumerate([(2, 64), (3, 128)]):
            head[l, rng.choice(4, hk, replace=False)] = 1
            neuron[l, rng.choice(256, nk, replace=False)] = 1
        g = Gates(jnp.asarray(head), jnp.asarray(neuron))
        cms.append(compact_vit_ragged(params, g, CFG, neuron_multiple=8))
    ens = EnsMLP(num_classes=9, sub_size=CFG.embed_dim, num_divisions=num_div,
                 teacher_size=32, family="deit", dtype=jnp.float32)
    tok = jnp.zeros((num_div, 2, CFG.embed_dim))
    ens_vars = ens.init(jax.random.key(99), tok, tok)
    return cms, ens, ens_vars


_KW = dict(batch=3, iters=1, repeats=1, image_size=32, patch_size=8,
           dtype=jnp.float32, use_pallas=False, fast_math=False)


def test_topology_measured_branch_multidevice():
    assert jax.device_count() >= 5  # 4 divisions + a spare fusion chip
    cms, ens, ens_vars = _tiny()
    res = bench.measure_topology(
        cms, lambda ev, c, t: ens.apply(ev, c, t), ens_vars,
        devices=jax.devices(), **_KW)
    assert res["mode"] == "measured-multichip"
    assert res["num_divisions"] == 4 and res["num_devices"] == len(jax.devices())
    assert res["value"] == res["img_per_sec_stream"] > 0
    assert res["img_per_sec_sync"] > 0
    assert res["ms_per_batch_stream"] > 0 and res["ms_per_batch_sync"] > 0
    # real per-chip placement: 4 distinct division devices + a spare fusion
    assert len(set(res["division_devices"])) == 4
    assert res["fusion_device"] not in set(res["division_devices"])
    json.dumps(res)  # driver artifact must be JSON-serializable as-is


def test_topology_projection_branch_single_device():
    cms, ens, ens_vars = _tiny()
    res = bench.measure_topology(
        cms, lambda ev, c, t: ens.apply(ev, c, t), ens_vars,
        devices=[jax.devices()[0]], **_KW)
    assert res["mode"] == "projection"
    assert len(res["division_ms"]) == 4 and min(res["division_ms"]) > 0
    assert res["fusion_ms"] > 0
    worst = max(res["division_ms"])
    # projection arithmetic: dchip uses max(div)+fusion, stream uses max(div)
    assert res["value"] == res["projected_img_per_sec_dchip"]
    np.testing.assert_allclose(
        res["projected_img_per_sec_dchip"],
        3 / (worst + res["fusion_ms"]) * 1e3, rtol=0.02)
    np.testing.assert_allclose(
        res["projected_img_per_sec_stream"], 3 / worst * 1e3, rtol=0.02)
    assert res["projected_img_per_sec_stream"] > res["projected_img_per_sec_dchip"]
    json.dumps(res)


def test_bench_cli_topology_flag():
    """--topology parses, is mutually exclusive with --train/--latency, and
    the env contract reaches bench.py's main() dispatch."""
    from devit_tpu.cli.__main__ import build_parser

    p = build_parser()
    args = p.parse_args(["bench", "--topology"])
    assert args.topology
    import pytest
    with pytest.raises(SystemExit):
        p.parse_args(["bench", "--topology", "--train"])
