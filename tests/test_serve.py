"""Multi-device collaborative serving (parallel/serve.py): each ragged
compact division committed to its own device, tokens gathered to the fusion
device — must match the single-device sequential serving path exactly.
Runs on the 8-virtual-CPU-device mesh from conftest.py."""

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.configs import get_vit_config
from devit_tpu.models.compact_vit import compact_forward, compact_vit_ragged
from devit_tpu.models.ensemble import EnsMLP
from devit_tpu.models.vit import Gates, VisionTransformer
from devit_tpu.parallel.serve import make_collaborative_server

CFG = get_vit_config("dedeit", img_size=32, patch_size=8, embed_dim=64,
                     depth=2, num_heads=4, num_classes=9)


def _build(num_div=4):
    model = VisionTransformer(CFG, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    rng = np.random.default_rng(0)
    cms, gates_list = [], []
    for d in range(num_div):
        params = model.init(jax.random.key(d), x)["params"]
        head = np.zeros((2, 4), np.float32)
        neuron = np.zeros((2, 256), np.float32)
        for l, (hk, nk) in enumerate([(2, 64), (3, 128)]):
            head[l, rng.choice(4, hk, replace=False)] = 1
            neuron[l, rng.choice(256, nk, replace=False)] = 1
        g = Gates(jnp.asarray(head), jnp.asarray(neuron))
        cms.append(compact_vit_ragged(params, g, CFG, neuron_multiple=8))
        gates_list.append(g)
    ens = EnsMLP(num_classes=9, sub_size=CFG.embed_dim, num_divisions=num_div,
                 teacher_size=32, family="deit", dtype=jnp.float32)
    tok = jnp.zeros((num_div, 2, CFG.embed_dim))
    ens_vars = ens.init(jax.random.key(99), tok, tok)
    return cms, ens, ens_vars


def test_collaborative_serve_matches_sequential():
    assert jax.device_count() >= 4
    cms, ens, ens_vars = _build()
    images = jax.random.normal(jax.random.key(7), (3, 32, 32, 3))

    serve = make_collaborative_server(
        cms, lambda ev, c, t: ens.apply(ev, c, t), ens_vars,
        patch_size=8, dtype=jnp.float32, use_pallas=False, fast_math=False)
    got = np.asarray(serve(ens_vars, images))

    # sequential single-device reference
    feats = [compact_forward(cm, images, patch_size=8, dtype=jnp.float32,
                             use_pallas=False, fast_math=False,
                             features_only=True) for cm in cms]
    want = ens.apply(ens_vars, jnp.stack([c for c, _ in feats]),
                     jnp.stack([t for _, t in feats])).logits
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)

    # the division params really ARE placed on distinct devices (assert actual
    # array placement, not the arithmetic device list)
    assert len(set(serve.division_devices)) >= 4
    # fusion defaults to the first SPARE chip (8 devices, 4 divisions), so
    # streaming fusion never contends with division 0's next-batch forward
    assert serve.fusion_device == jax.devices()[4]
    assert serve.fusion_device not in set(serve.division_devices)
    for d, (cm, dev) in enumerate(zip(serve.placed_divisions,
                                      serve.division_devices)):
        leaves = [x for x in jax.tree_util.tree_leaves(cm) if hasattr(x, "devices")]
        assert leaves, f"division {d} has no placed arrays"
        for leaf in leaves:
            assert leaf.devices() == {dev}, (
                f"division {d} leaf on {leaf.devices()}, expected {dev}")

    # a fresh ens_vars passed at call time is really used (not the build-time
    # copy): zeroed fusion weights must change the logits
    zeros = jax.tree_util.tree_map(jnp.zeros_like, ens_vars)
    got0 = np.asarray(serve(zeros, images))
    assert not np.allclose(got0, got)


def test_stream_matches_per_batch_serve():
    """serve.stream yields the same logits, in order, as one serve() call per
    batch — for every in-flight depth and for ragged batch counts around the
    depth (fewer batches than depth exercises the tail-flush path)."""
    cms, ens, ens_vars = _build()
    serve = make_collaborative_server(
        cms, lambda ev, c, t: ens.apply(ev, c, t), ens_vars,
        patch_size=8, dtype=jnp.float32, use_pallas=False, fast_math=False)
    batches = [np.asarray(jax.random.normal(jax.random.key(i), (3, 32, 32, 3)))
               for i in range(5)]
    want = [np.asarray(serve(ens_vars, b)) for b in batches]
    for depth in (1, 2, 7):  # 7 > len(batches): everything in flight at once
        got = list(serve.stream(ens_vars, batches, depth=depth))
        assert len(got) == len(batches)
        for k, (g, w) in enumerate(zip(got, want)):
            assert isinstance(g, np.ndarray)  # host-materialized
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-5,
                                       err_msg=f"depth={depth} batch={k}")
    # no silent drop on an empty iterator
    assert list(serve.stream(ens_vars, [])) == []


def test_fusion_device_override_and_contended_default():
    """Explicit fusion_device wins; with no spare device (divisions == devices)
    the default falls back to devices[0] as before."""
    cms, ens, ens_vars = _build()
    devs = jax.devices()
    images = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))

    over = make_collaborative_server(
        cms, lambda ev, c, t: ens.apply(ev, c, t), ens_vars,
        patch_size=8, dtype=jnp.float32, use_pallas=False, fast_math=False,
        fusion_device=devs[7])
    assert over.fusion_device == devs[7]

    packed = make_collaborative_server(
        cms, lambda ev, c, t: ens.apply(ev, c, t), ens_vars,
        patch_size=8, dtype=jnp.float32, use_pallas=False, fast_math=False,
        devices=devs[:4])
    assert packed.fusion_device == devs[0]
    np.testing.assert_allclose(np.asarray(over(ens_vars, images)),
                               np.asarray(packed(ens_vars, images)),
                               rtol=1e-5, atol=1e-5)
