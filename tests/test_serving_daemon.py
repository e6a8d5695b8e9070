"""The serving daemon (devit serve, devit_tpu/serving/daemon.py): engine
forward == the offline fused serving math (bucket padding can't change
logits), micro-batching coalesces concurrent requests into one device batch,
the HTTP surface (predict/healthz/stats, error paths, host resize of
off-sized clients), and fusion-geometry inference from the stage-5
checkpoint's own shapes. Reference has no serving surface (engine.py:212-242
is offline eval only) — the math itself is pinned elsewhere
(test_compact_ragged / test_ensemble_and_steps); here we pin the daemon."""

import json
import os
import sys
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devit_tpu.configs import get_vit_config
from devit_tpu.data.pipeline import normalize
from devit_tpu.io.checkpoint import save_pytree
from devit_tpu.models.compact_vit import (
    compact_vit_ragged, save_compact, stack_division_features,
)
from devit_tpu.models.ensemble import EnsMLP
from devit_tpu.models.vit import Gates, VisionTransformer
from devit_tpu.serving.daemon import (
    InferenceEngine, MicroBatcher, ServeConfig, _host_resize,
    build_engine_from_artifacts, build_server,
)

IMG = 32
D = 3
K = 9
CFG = get_vit_config("dedeit", img_size=IMG, patch_size=8, embed_dim=64,
                     depth=2, num_heads=4, num_classes=K)
SCFG = ServeConfig(input_size=IMG, patch_size=8, buckets=(2, 4, 8),
                   max_wait_ms=5.0, dtype=jnp.float32, use_pallas=False,
                   fast_math=False, warmup=False)


def _tiny_cms():
    model = VisionTransformer(CFG, dtype=jnp.float32)
    x = jnp.zeros((2, IMG, IMG, 3))
    rng = np.random.default_rng(0)
    cms = []
    for d in range(D):
        params = model.init(jax.random.key(d), x)["params"]
        head = np.zeros((2, 4), np.float32)
        neuron = np.zeros((2, 256), np.float32)
        for l, (hk, nk) in enumerate([(2, 64), (3, 128)]):
            head[l, rng.choice(4, hk, replace=False)] = 1
            neuron[l, rng.choice(256, nk, replace=False)] = 1
        g = Gates(jnp.asarray(head), jnp.asarray(neuron))
        cms.append(compact_vit_ragged(params, g, CFG, neuron_multiple=8))
    return cms


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("deploy")
    cms = _tiny_cms()
    for i, cm in enumerate(cms):
        d = os.path.join(root, f"sub-dataset{i}")
        os.makedirs(d)
        save_compact(os.path.join(d, "compact.msgpack"), cm)
    ens = EnsMLP(num_classes=K, sub_size=CFG.embed_dim, num_divisions=D,
                 teacher_size=48, family="deit", dtype=jnp.float32)
    tok = jnp.zeros((D, 2, CFG.embed_dim))
    ens_vars = ens.init(jax.random.key(99), tok, tok)
    ens_path = os.path.join(root, "ens.msgpack")
    # the stage-5 checkpoint layout (cli/stages.py: {'ens_params': ...})
    save_pytree(ens_path, {"ens_params": ens_vars["params"]})
    return str(root), ens_path, cms, ens, ens_vars


@pytest.fixture(scope="module")
def engine(artifacts):
    root, ens_path, *_ = artifacts
    return build_engine_from_artifacts(root, ens_path, cfg=SCFG, log=None)


def _imgs(n, size=IMG, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (n, size, size, 3), dtype=np.uint8)


# --------------------------------------------------------------- engine math


def test_geometry_inferred_from_checkpoint(engine):
    assert engine.num_divisions == D
    assert engine.num_classes == K


def test_engine_matches_offline_fused_forward(artifacts, engine):
    _, _, cms, ens, ens_vars = artifacts
    imgs = _imgs(4)
    got = engine.predict(imgs)
    x = normalize(jnp.asarray(imgs, jnp.float32) / 255.0, jnp.float32)
    cls_s, dist_s = stack_division_features(
        cms, x, patch_size=8, dtype=jnp.float32, use_pallas=False,
        fast_math=False)
    want = np.asarray(ens.apply(ens_vars, cls_s, dist_s).logits)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bucket_padding_does_not_change_logits(engine):
    imgs = _imgs(5, seed=1)
    full = engine.predict(imgs)           # chunks: bucket 4 + pad-to-2
    for i in range(5):
        one = engine.predict(imgs[i:i + 1])  # pads to bucket 2
        np.testing.assert_allclose(one[0], full[i], rtol=2e-5, atol=2e-5)


def test_predict_rejects_wrong_shape(engine):
    with pytest.raises(ValueError, match="expects"):
        engine.predict(_imgs(2, size=IMG * 2))


def test_wrong_pairing_raises(artifacts, tmp_path):
    root, _, _, _, _ = artifacts
    bad = EnsMLP(num_classes=K, sub_size=CFG.embed_dim, num_divisions=D + 1,
                 teacher_size=48, family="deit", dtype=jnp.float32)
    tok = jnp.zeros((D + 1, 2, CFG.embed_dim))
    p = str(tmp_path / "bad.msgpack")
    save_pytree(p, {"ens_params": bad.init(jax.random.key(0), tok, tok)["params"]})
    with pytest.raises(ValueError, match="pairing"):
        build_engine_from_artifacts(root, p, cfg=SCFG, log=None)


def test_host_resize_identity_and_geometry():
    img = _imgs(1, size=IMG)[0]
    assert _host_resize(img, IMG) is img  # no-op fast path
    big = _imgs(1, size=77, seed=3)[0]
    out = _host_resize(big, IMG)
    assert out.shape == (IMG, IMG, 3) and out.dtype == np.uint8


def test_single_device_branch_matches_multichip(artifacts, engine, monkeypatch):
    """The 8-virtual-device conftest makes every other test run the
    collaborative (multichip) engine; pin the 1-device fused-program branch
    (what one real chip serves) against it."""
    root, ens_path, *_ = artifacts
    dev0 = jax.local_devices()[0]
    monkeypatch.setattr(jax, "local_devices", lambda *a, **k: [dev0])
    single = build_engine_from_artifacts(root, ens_path, cfg=SCFG, log=None)
    assert not single._multichip and engine._multichip
    imgs = _imgs(4, seed=9)
    np.testing.assert_allclose(single.predict(imgs), engine.predict(imgs),
                               rtol=2e-5, atol=2e-5)


# ------------------------------------------------------------ micro-batching


def test_batcher_coalesces_queued_requests(engine):
    b = MicroBatcher(engine)  # not started: both requests queue first
    f1 = b.submit(_imgs(2, seed=4))
    f2 = b.submit(_imgs(2, seed=5))
    b.start()
    r1, r2 = f1.result(timeout=60), f2.result(timeout=60)
    b.stop()
    assert r1.shape == (2, K) and r2.shape == (2, K)
    assert b.stats["batches"] == 1 and b.stats["coalesced"] == 1
    assert b.stats["requests"] == 2 and b.stats["images"] == 4
    # the per-request rows equal solo forwards (split-back correctness)
    np.testing.assert_allclose(r2, engine.predict(_imgs(2, seed=5)),
                               rtol=2e-5, atol=2e-5)


def test_batcher_drains_ready_queue_past_wait_window(engine):
    """Requests that queued up while a previous batch was dispatching are
    ready at zero cost and must coalesce even after the oldest request's
    wait window expired — otherwise sustained load degenerates to
    batch-of-1 while the queue grows."""
    import time

    b = MicroBatcher(engine)
    f1 = b.submit(_imgs(1, seed=20))
    f2 = b.submit(_imgs(1, seed=21))
    time.sleep((SCFG.max_wait_ms + 20) / 1000.0)  # window long expired
    b.start()
    f1.result(timeout=60), f2.result(timeout=60)
    b.stop()
    assert b.stats["batches"] == 1 and b.stats["coalesced"] == 1


def test_stop_fails_queued_requests_promptly(engine):
    b = MicroBatcher(engine)  # never started: the request stays queued
    fut = b.submit(_imgs(1, seed=22))
    b.stop()
    with pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=5)


def test_fusion_vars_device_committed(engine):
    """msgpack restore yields host numpy; uncommitted args re-upload the
    whole fusion head every dispatch (~17 MB/call at real geometry)."""
    leaves = jax.tree_util.tree_leaves(engine._ens_vars)
    assert all(isinstance(x, jax.Array) for x in leaves)
    assert all(x.devices() == {engine.fusion_device} for x in leaves)


def test_batcher_delivers_exceptions(engine):
    b = MicroBatcher(engine)
    fut = b.submit(_imgs(1, size=IMG * 2))  # wrong shape -> predict raises
    b.start()
    with pytest.raises(ValueError):
        fut.result(timeout=60)
    b.stop()


# ------------------------------------------------------------------- HTTP


@pytest.fixture(scope="module")
def server(engine):
    httpd, batcher = build_server(engine, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    host, port = httpd.server_address[:2]
    yield f"http://{host}:{port}"
    httpd.shutdown()
    httpd.server_close()
    batcher.stop()


def _post(url, imgs, path="/predict"):
    req = urllib.request.Request(
        url + path, data=imgs.tobytes(),
        headers={"X-Image-Shape": ",".join(map(str, imgs.shape))})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_predict_single_and_batch(server, engine, artifacts):
    _, _, cms, ens, ens_vars = artifacts
    imgs = _imgs(3, seed=6)
    code, out = _post(server, imgs)
    assert code == 200
    preds = out["predictions"]
    assert len(preds) == 3 and out["latency_ms"] > 0
    assert all(len(p["topk"]) == SCFG.topk for p in preds)
    # argmax agrees with a direct engine forward
    want = engine.predict(imgs).argmax(-1)
    got = np.array([p["topk"][0] for p in preds])
    np.testing.assert_array_equal(got, want)
    # probs are softmax-sorted descending
    for p in preds:
        assert all(a >= b for a, b in zip(p["probs"], p["probs"][1:]))
    # single image, 3-d header form + ?topk=
    one = imgs[0]
    req = urllib.request.Request(
        server + "/predict?topk=2", data=one.tobytes(),
        headers={"X-Image-Shape": ",".join(map(str, one.shape))})
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.loads(r.read())
    assert len(out["predictions"]) == 1
    assert len(out["predictions"][0]["topk"]) == 2


def test_http_resizes_offsize_clients(server):
    code, out = _post(server, _imgs(2, size=50, seed=7))
    assert code == 200 and len(out["predictions"]) == 2


def test_http_error_paths(server):
    imgs = _imgs(1)
    # truncated body
    req = urllib.request.Request(
        server + "/predict", data=imgs.tobytes()[:-7],
        headers={"X-Image-Shape": ",".join(map(str, imgs.shape))})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400 and "bytes" in json.loads(e.read())["error"]
    # bad shape header
    req = urllib.request.Request(server + "/predict", data=b"xx",
                                 headers={"X-Image-Shape": "2,2"})
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown route
    try:
        urllib.request.urlopen(server + "/nope", timeout=60)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_reload_fusion_hot_swaps_weights(artifacts, server, tmp_path):
    """/reload swaps the fusion head without recompiling (predictions change
    to the new head's, geometry mismatches are rejected 400, and the original
    weights restore cleanly so other tests are unaffected)."""
    root, ens_path, _, ens, _ = artifacts
    imgs = _imgs(2, seed=11)
    before = _post(server, imgs)[1]["predictions"]
    # a different-seed fusion head with identical geometry
    tok = jnp.zeros((D, 2, CFG.embed_dim))
    alt = ens.init(jax.random.key(7), tok, tok)["params"]
    alt_path = str(tmp_path / "alt.msgpack")
    save_pytree(alt_path, {"ens_params": alt})

    def reload(path):
        req = urllib.request.Request(
            server + "/reload", data=json.dumps({"ens_path": path}).encode())
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    code, out = reload(alt_path)
    assert code == 200 and out["status"] == "reloaded"
    after = _post(server, imgs)[1]["predictions"]
    assert any(b["probs"] != a["probs"] for b, a in zip(before, after))
    # wrong geometry -> 400, serving state unchanged
    bad = EnsMLP(num_classes=K + 1, sub_size=CFG.embed_dim, num_divisions=D,
                 teacher_size=48, family="deit", dtype=jnp.float32)
    tok = jnp.zeros((D, 2, CFG.embed_dim))
    bad_path = str(tmp_path / "badgeom.msgpack")
    save_pytree(bad_path,
                {"ens_params": bad.init(jax.random.key(0), tok, tok)["params"]})
    code, out = reload(bad_path)
    assert code == 400 and "geometry" in out["error"]
    code, _ = reload(str(tmp_path / "missing.msgpack"))
    assert code == 400
    # a valid msgpack of the WRONG THING (non-dict) -> clean 400, not a
    # dropped connection from an AttributeError in the handler thread
    notdict_path = str(tmp_path / "notdict.msgpack")
    import msgpack

    with open(notdict_path, "wb") as f:  # raw list; save_pytree would
        f.write(msgpack.packb([1, 2, 3]))  # state-dict it into {'0': 1, ...}
    code, out = reload(notdict_path)
    assert code == 400 and "not a checkpoint dict" in out["error"]
    # corrupt bytes (msgpack ExtraData is a ValueError subclass) -> 400
    corrupt_path = str(tmp_path / "corrupt.msgpack")
    with open(corrupt_path, "wb") as f:
        f.write(b"not msgpack \x00\xff garbage")
    assert reload(corrupt_path)[0] == 400
    # non-dict / non-string bodies are a clean 400, not a handler crash
    for raw in (b"[1,2]", b"\"x\"", b"{\"ens_path\": 5}", b"{nope"):
        req = urllib.request.Request(server + "/reload", data=raw)
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    # restore the module-scoped server's original head
    assert reload(ens_path)[0] == 200
    restored = _post(server, imgs)[1]["predictions"]
    assert all(b["probs"] == r["probs"] for b, r in zip(before, restored))


def test_http_healthz_and_stats(server):
    with urllib.request.urlopen(server + "/healthz", timeout=60) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["num_divisions"] == D
    assert h["num_classes"] == K and h["buckets"] == [2, 4, 8]
    with urllib.request.urlopen(server + "/stats", timeout=60) as r:
        s = json.loads(r.read())
    assert s["requests"] >= 1 and s["images"] >= 1
    assert s["latency_ms_p50"] is None or s["latency_ms_p50"] >= 0


# ----------------------------------------------------------------- CLI wiring


def test_cli_serve_parser_smoke(artifacts):
    from devit_tpu.cli.__main__ import build_parser

    root, ens_path, *_ = artifacts
    args = build_parser().parse_args(
        ["serve", "--compact-path", root, "--ens-path", ens_path,
         "--buckets", "2,4", "--input-size", str(IMG), "--patch-size", "8",
         "--dtype", "float32", "--no-fast-math", "--no-warmup"])
    assert args.fn is not None and args.compact_path == root
    assert args.num_division == 0  # auto-discover default


def test_smoke_mode_without_ens_path(artifacts):
    root, *_ = artifacts
    msgs = []
    eng = build_engine_from_artifacts(root, None, cfg=SCFG,
                                      log=msgs.append)
    assert any("RANDOM fusion head" in m for m in msgs)
    assert eng.predict(_imgs(2, seed=8)).shape == (2, eng.num_classes)


# ------------------------------------------------------- AOT-cached programs


def test_aot_engine_matches_plain_and_reloads(artifacts, engine, tmp_path,
                                              monkeypatch):
    """The AOT-cached single-device branch (weights as committed ARGUMENTS +
    cached_compile_validated per bucket) must be numerics-identical to the
    plain closure-jit branch, survive a fresh engine build against the same
    cache dir (the restart scenario — on hosts where XLA AOT loading is
    rejected, the validated fallback recompiles transparently), and keep the
    /reload hot-swap semantics (fusion vars stay a program argument)."""
    monkeypatch.setenv("DEVIT_AOT_CACHE", str(tmp_path / "aot"))
    dev0 = jax.local_devices()[0]  # AOT path is single-device-topology only
    monkeypatch.setattr(jax, "local_devices", lambda *a, **k: [dev0])
    root, ens_path, *_ = artifacts
    acfg = ServeConfig(**{**SCFG.__dict__, "aot_cache": True})
    aot = build_engine_from_artifacts(root, ens_path, cfg=acfg, log=None)
    assert aot._raw_fwd is not None and engine._raw_fwd is None
    imgs = _imgs(6, seed=3)
    np.testing.assert_allclose(aot.predict(imgs), engine.predict(imgs),
                               rtol=2e-5, atol=2e-5)
    # an entry was written for the touched bucket (6 imgs pad to bucket 8)
    assert len(list((tmp_path / "aot").iterdir())) == 1

    # restart: a second engine over the same cache dir
    aot2 = build_engine_from_artifacts(root, ens_path, cfg=acfg, log=None)
    np.testing.assert_allclose(aot2.predict(imgs), engine.predict(imgs),
                               rtol=2e-5, atol=2e-5)

    # hot reload still swaps the fusion head without rebuilding programs
    _, _, cms, ens, _ = artifacts
    tok = jnp.zeros((D, 2, CFG.embed_dim))
    new_vars = ens.init(jax.random.key(123), tok, tok)
    p2 = str(tmp_path / "ens2.msgpack")
    save_pytree(p2, {"ens_params": new_vars["params"]})
    progs_before = dict(aot._programs)
    aot.reload_fusion(p2)
    assert aot._programs == progs_before
    x = normalize(jnp.asarray(imgs, jnp.float32) / 255.0, jnp.float32)
    cls_s, dist_s = stack_division_features(
        cms, x, patch_size=8, dtype=jnp.float32, use_pallas=False,
        fast_math=False)
    want = np.asarray(ens.apply(new_vars, cls_s, dist_s).logits)
    np.testing.assert_allclose(aot.predict(imgs), want, rtol=2e-5, atol=2e-5)
