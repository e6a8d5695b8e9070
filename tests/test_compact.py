"""Compaction equivalence: the compacted model must reproduce the gated
model's outputs exactly (up to float noise) while running smaller shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.configs import get_vit_config
from devit_tpu.core.compact import compact_divisions, compact_vit_params
from devit_tpu.models.vit import Gates, VisionTransformer

CFG = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=64,
                     depth=3, num_heads=4, num_classes=9)


def make_gates(seed, head_keep, neuron_keep):
    rng = np.random.default_rng(seed)
    head = np.zeros((CFG.depth, CFG.num_heads), np.float32)
    neuron = np.zeros((CFG.depth, CFG.hidden_dim), np.float32)
    for l in range(CFG.depth):
        head[l, rng.choice(CFG.num_heads, head_keep, replace=False)] = 1
        neuron[l, rng.choice(CFG.hidden_dim, neuron_keep, replace=False)] = 1
    return Gates(jnp.asarray(head), jnp.asarray(neuron))


def test_compact_equivalence():
    model = VisionTransformer(CFG, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = model.init(jax.random.key(1), x)["params"]
    gates = make_gates(0, head_keep=2, neuron_keep=100)

    ref = model.apply({"params": params}, x, gates=gates)

    cparams, ccfg = compact_vit_params(params, gates, CFG,
                                       head_multiple=1, neuron_multiple=8)
    assert ccfg.num_heads == 2
    assert ccfg.hidden_dim == 104  # 100 rounded to 8
    cmodel = VisionTransformer(ccfg, dtype=jnp.float32)
    out = cmodel.apply({"params": cparams}, x)

    np.testing.assert_allclose(np.asarray(out.logits), np.asarray(ref.logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.cls_feat), np.asarray(ref.cls_feat),
                               rtol=1e-4, atol=1e-4)


def test_compact_ragged_layers():
    """Different kept counts per layer pad up to the max; still equivalent."""
    model = VisionTransformer(CFG, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    params = model.init(jax.random.key(3), x)["params"]
    rng = np.random.default_rng(7)
    head = np.zeros((CFG.depth, 4), np.float32)
    neuron = np.zeros((CFG.depth, 256), np.float32)
    for l, (hk, nk) in enumerate([(1, 60), (3, 120), (2, 90)]):
        head[l, rng.choice(4, hk, replace=False)] = 1
        neuron[l, rng.choice(256, nk, replace=False)] = 1
    gates = Gates(jnp.asarray(head), jnp.asarray(neuron))

    ref = model.apply({"params": params}, x, gates=gates)
    cparams, ccfg = compact_vit_params(params, gates, CFG,
                                       head_multiple=1, neuron_multiple=8)
    assert ccfg.num_heads == 3 and ccfg.hidden_dim == 120
    cmodel = VisionTransformer(ccfg, dtype=jnp.float32)
    out = cmodel.apply({"params": cparams}, x)
    np.testing.assert_allclose(np.asarray(out.logits), np.asarray(ref.logits),
                               rtol=1e-4, atol=1e-4)


def test_compact_divisions_common_geometry():
    model = VisionTransformer(CFG, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(4), (2, 32, 32, 3))
    p0 = model.init(jax.random.key(5), x)["params"]
    p1 = model.init(jax.random.key(6), x)["params"]
    g0 = make_gates(1, head_keep=2, neuron_keep=64)
    g1 = make_gates(2, head_keep=3, neuron_keep=128)
    clist, ccfg = compact_divisions([p0, p1], [g0, g1], CFG,
                                    head_multiple=1, neuron_multiple=8)
    assert ccfg.num_heads == 3 and ccfg.hidden_dim == 128
    cmodel = VisionTransformer(ccfg, dtype=jnp.float32)
    for p, g, cp in [(p0, g0, clist[0]), (p1, g1, clist[1])]:
        ref = model.apply({"params": p}, x, gates=g)
        out = cmodel.apply({"params": cp}, x)
        np.testing.assert_allclose(np.asarray(out.logits), np.asarray(ref.logits),
                                   rtol=1e-4, atol=1e-4)
    # stacked shapes identical -> vmappable
    stacked = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *clist)
    feats = jax.vmap(lambda pp: cmodel.apply({"params": pp}, x, features_only=True).cls_feat)(stacked)
    assert feats.shape == (2, 2, 64)


def test_compact_rejects_fractional_gates():
    """Both compaction paths must refuse non-binary gates: compaction DROPS
    pruned slots, while the gated model SCALES by the gate value — a
    fractional gate compacted as full-keep would silently change the math
    (compact_vit_ragged already raised; compact_vit_params now matches)."""
    import pytest
    from devit_tpu.models.compact_vit import compact_vit_ragged

    model = VisionTransformer(CFG)
    params = model.init(jax.random.key(0), jnp.zeros((1, CFG.img_size,
                                                      CFG.img_size, 3)))["params"]
    g = make_gates(0, 2, 96)
    bad = Gates(g.head.at[0, 0].set(0.5), g.neuron)
    with pytest.raises(ValueError, match="binary"):
        compact_vit_params(params, bad, CFG)
    with pytest.raises(ValueError, match="binary"):
        compact_vit_ragged(params, bad, CFG)


def test_compact_equivalence_randomized_sweep():
    """Both compaction forms (padded-stacked compact_vit_params and the
    ragged deployment compact_vit_ragged) must equal the gated forward for
    ARBITRARY per-layer binary gate patterns, including the edges (single
    kept head, all heads kept, heavily pruned neurons) — the fixed patterns
    above can't cover the gather/zero-pad index arithmetic space."""
    from devit_tpu.models.compact_vit import compact_forward, compact_vit_ragged

    model = VisionTransformer(CFG, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(10), (2, 32, 32, 3))
    params = model.init(jax.random.key(11), x)["params"]
    rng = np.random.default_rng(123)

    for trial in range(4):
        head = np.zeros((CFG.depth, CFG.num_heads), np.float32)
        neuron = np.zeros((CFG.depth, CFG.hidden_dim), np.float32)
        for l in range(CFG.depth):
            hk = int(rng.integers(1, CFG.num_heads + 1))   # 1..H inclusive
            nk = int(rng.integers(8, CFG.hidden_dim + 1))
            head[l, rng.choice(CFG.num_heads, hk, replace=False)] = 1
            neuron[l, rng.choice(CFG.hidden_dim, nk, replace=False)] = 1
        gates = Gates(jnp.asarray(head), jnp.asarray(neuron))
        ref = model.apply({"params": params}, x, gates=gates)

        cparams, ccfg = compact_vit_params(params, gates, CFG,
                                           head_multiple=1, neuron_multiple=8)
        out_p = VisionTransformer(ccfg, dtype=jnp.float32).apply(
            {"params": cparams}, x)
        np.testing.assert_allclose(np.asarray(out_p.logits),
                                   np.asarray(ref.logits),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"padded trial {trial}")

        cm = compact_vit_ragged(params, gates, CFG, neuron_multiple=8)
        out_r = compact_forward(cm, x.astype(jnp.float32), patch_size=CFG.patch_size,
                                dtype=jnp.float32, use_pallas=False,
                                fast_math=False)
        np.testing.assert_allclose(np.asarray(out_r),
                                   np.asarray(ref.logits),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"ragged trial {trial}")
