"""Production serving daemon for the deployed collaborative ensemble.

`devit serve --compact-path out/deploy --ens-path out/ensemble/checkpoint.msgpack`
loads the deploy-stage compact division artifacts plus the stage-5 fusion
head and serves collaborative inference over HTTP — the online counterpart of
the offline eval path (`ensemble --eval --compact-path ...`) and the paper's
deployment story (reference engine.py:212-242 is batch eval only; the
reference has no serving surface at all, this is a capability superset).

Design, TPU-first:

- ONE batcher thread owns the device: requests land in a queue, the batcher
  coalesces everything that arrives within `max_wait_ms` of the oldest
  waiting request, pads the coalesced batch up to a fixed BUCKET size, and
  dispatches a single program. Fixed buckets mean a handful of XLA programs
  compiled once at startup (`warmup`) — never a data-dependent shape, never a
  mid-traffic 30-90 s tunnel compile. On the single-device topology the
  bucket programs additionally go through the on-disk AOT executable cache
  (io/aot_cache.py): a daemon restart reloads each in seconds instead of
  recompiling, and the division weights ride as committed ARGUMENTS so the
  cached payload is code-only. Bigger batches amortize the MXU
  (bench.py: bs256 is the measured single-chip optimum), so coalescing
  concurrent clients is also the throughput-right move, not just a latency
  trade.
- With >1 local device the engine runs the real deployment topology
  (parallel/serve.py): each ragged division committed to its own chip, only
  the (B, C) token pairs crossing to the fusion chip. With 1 device it uses
  the same fused single-program layout bench.py measures.
- Image prep: clients SHOULD send `input_size`-sized uint8 RGB; anything else
  is resized on the HOST (PIL, torchvision Resize(256/224*S)+CenterCrop(S)
  eval semantics — data/host_augment.py rationale: per-sample geometry is
  host work, measured) so arbitrary client sizes can never force a device
  recompile. Normalize runs on-device inside the serving program.

Protocol (stdlib http.server; one POST = one or more images):

    POST /predict
      body:    raw uint8 RGB bytes, C-order
      headers: X-Image-Shape: "N,H,W,3" (or "H,W,3" for a single image)
      query:   ?topk=5 (optional, default ServeConfig.topk)
      reply:   {"predictions": [{"topk": [...], "probs": [...]}, ...],
                "latency_ms": float}
    GET /healthz   -> model/topology info (also the readiness probe)
    GET /stats     -> request/image/batch counters + latency percentiles

Feature vs the reference: none (it has no server) — cited instead to the
task's serving requirement; the fused-forward math is exactly
models/compact_vit.py `stack_division_features` + models/ensemble.py EnsMLP,
both parity-tested against the reference's modules.
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional, Sequence, Tuple
from urllib.parse import parse_qs, urlparse

import jax
import jax.numpy as jnp
import numpy as np

from devit_tpu.models.compact_vit import (
    CompactViT,
    load_compact,
    stack_division_features,
)
from devit_tpu.models.ensemble import EnsMLP


@dataclasses.dataclass
class ServeConfig:
    input_size: int = 224
    patch_size: int = 16
    # batch buckets, one compiled program each; requests pad up to the
    # smallest bucket that fits, bigger coalesced batches chunk at max()
    buckets: Tuple[int, ...] = (1, 8, 32, 128, 256)
    max_wait_ms: float = 5.0  # coalescing window from the OLDEST queued request
    topk: int = 5
    dtype: object = jnp.bfloat16
    use_pallas: Optional[bool] = None  # None = auto (pallas off CPU backend)
    fast_math: bool = True  # serving default, as bench.py (parity runs: False)
    warmup: bool = True  # compile every bucket before accepting traffic
    # On-disk AOT executable cache (io/aot_cache.py) for the bucket programs:
    # a daemon RESTART then reloads each program in ~1-10 s instead of paying
    # the 30-90 s (slow periods: minutes) tunnel compile per bucket again.
    # None = auto (on for TPU, off for the CPU backend, whose AOT loader
    # rejects execution on this host — the validated fallback still works but
    # gains nothing). Single-device topology only: the multichip path commits
    # per-division programs to specific chips, which AOT entries don't carry.
    aot_cache: Optional[bool] = None


class InferenceEngine:
    """Bucketed forward over the compact divisions + EnsMLP fusion.

    Single entry `predict(uint8 images (N,S,S,3)) -> np.float32 logits (N,K)`;
    thread-compatible but intended to be driven by the single MicroBatcher
    thread so one owner serializes device dispatch.
    """

    def __init__(self, cms: Sequence[CompactViT], ens: EnsMLP, ens_vars,
                 cfg: ServeConfig):
        self.cfg = cfg
        self.num_divisions = len(cms)
        self.num_classes = ens.num_classes
        use_pallas = cfg.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() not in ("cpu",)
        self._multichip = len(jax.local_devices()) > 1
        self._raw_fwd = None  # set by the AOT-cached single-device branch
        from devit_tpu.data.pipeline import normalize

        if self._multichip:
            # the deployment topology: divisions committed per chip, token
            # fusion on the spare chip (parallel/serve.py)
            from devit_tpu.parallel.serve import make_collaborative_server

            serve_fn = make_collaborative_server(
                list(cms), lambda ev, c, t: ens.apply(ev, c, t), ens_vars,
                patch_size=cfg.patch_size, dtype=cfg.dtype,
                use_pallas=use_pallas, fast_math=cfg.fast_math)
            self.division_devices = serve_fn.division_devices
            self.fusion_device = serve_fn.fusion_device
            fwd = serve_fn  # serve_fn(ens_vars, images) -> logits
        else:
            dev = jax.local_devices()[0]
            self.division_devices = [dev] * len(cms)
            self.fusion_device = dev
            cms = list(cms)
            aot = cfg.aot_cache
            if aot is None:
                aot = jax.default_backend() not in ("cpu",)
            if aot:
                # AOT-cacheable layout: the frozen division weights ride as
                # program ARGUMENTS (committed to the device once here), so
                # the serialized executable is code-only (a closure-constant
                # version bakes the weights in — 713 MB measured) and the
                # cache entry is reusable across restarts AND across
                # deployments with identical geometry. normalize folds into
                # the same program: one dispatch per bucket instead of two.
                from devit_tpu.io.aot_cache import split_arrays, static_salt

                cms_arrs, rebuild = split_arrays(cms)
                self._cms_arrs = [jax.device_put(jnp.asarray(a), dev)
                                  for a in cms_arrs]
                # everything program-changing that the arg avals DON'T see
                self._salt = "|".join([
                    static_salt(cms), f"pallas={use_pallas}",
                    f"fast={cfg.fast_math}", f"ps={cfg.patch_size}",
                    f"dt={jnp.dtype(cfg.dtype).name}"])

                def raw_fwd(ev, cms_leaves, img_u8):
                    img = normalize(img_u8.astype(jnp.float32) / 255.0,
                                    jnp.float32)
                    cls_stack, dist_stack = stack_division_features(
                        rebuild(cms_leaves), img, patch_size=cfg.patch_size,
                        dtype=cfg.dtype, use_pallas=use_pallas,
                        fast_math=cfg.fast_math)
                    return ens.apply(ev, cls_stack, dist_stack).logits

                self._raw_fwd = raw_fwd
                self._programs = {}  # bucket size -> compiled executable
                fwd = None
            else:
                # cms closed into the jit deliberately (frozen ragged weights
                # as program constants — same pattern + rationale as
                # parallel/serve.py _division_fn); the fusion vars stay an
                # ARGUMENT in every branch so /reload can hot-swap them
                # without recompiling the division programs
                @jax.jit
                def fwd(ev, img_f32):
                    cls_stack, dist_stack = stack_division_features(
                        cms, img_f32, patch_size=cfg.patch_size,
                        dtype=cfg.dtype, use_pallas=use_pallas,
                        fast_math=cfg.fast_math)
                    return ens.apply(ev, cls_stack, dist_stack).logits

        @jax.jit
        def prep(img_u8):
            # inputs are already input_size x input_size (host resize
            # guarantees it) — normalize only, inside one program
            return normalize(img_u8.astype(jnp.float32) / 255.0, jnp.float32)

        self._prep = prep
        self._fwd = fwd
        self._ens = ens
        self._ens_vars = self._commit_vars(ens_vars)
        self._lock = threading.Lock()

    def _commit_vars(self, ens_vars):
        # msgpack restore yields HOST numpy leaves; passing those into the
        # program re-uploads the whole fusion head on EVERY dispatch (jax
        # re-transfers uncommitted host arguments each call — ~17 MB/call at
        # real geometry). Commit once to the fusion device.
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), self.fusion_device),
            ens_vars)

    def _run_bucket(self, images_u8: np.ndarray) -> np.ndarray:
        """One padded-bucket dispatch; images_u8 (n<=max_bucket, S, S, 3)."""
        n = images_u8.shape[0]
        bucket = next(b for b in sorted(self.cfg.buckets) if b >= n)
        if n < bucket:
            pad = np.zeros((bucket - n,) + images_u8.shape[1:], np.uint8)
            images_u8 = np.concatenate([images_u8, pad], axis=0)
        if self._raw_fwd is not None:
            img = jnp.asarray(images_u8)
            prog = self._programs.get(bucket)
            if prog is None:
                from devit_tpu.io.aot_cache import cached_compile_validated

                prog, logits = cached_compile_validated(
                    self._raw_fwd, f"serve-fwd-b{bucket}",
                    self._ens_vars, self._cms_arrs, img, salt=self._salt)
                self._programs[bucket] = prog
            else:
                logits = prog(self._ens_vars, self._cms_arrs, img)
        else:
            logits = self._fwd(self._ens_vars,
                               self._prep(jnp.asarray(images_u8)))
        return np.asarray(jax.device_get(logits), np.float32)[:n]

    def predict(self, images_u8: np.ndarray) -> np.ndarray:
        """uint8 (N, S, S, 3) -> float32 logits (N, num_classes). N beyond the
        largest bucket is chunked; the lock serializes stray direct callers
        against the batcher thread."""
        s = self.cfg.input_size
        if images_u8.ndim != 4 or images_u8.shape[1:] != (s, s, 3):
            raise ValueError(
                f"predict expects (N,{s},{s},3) uint8, got {images_u8.shape}")
        cap = max(self.cfg.buckets)
        with self._lock:
            outs = [self._run_bucket(images_u8[i:i + cap])
                    for i in range(0, images_u8.shape[0], cap)]
        return np.concatenate(outs, axis=0)

    def reload_fusion(self, ens_path: str) -> None:
        """Hot-swap the fusion weights from a (newer) stage-5 checkpoint —
        the head retrains far more often than the frozen compact backbones,
        and its vars are a program ARGUMENT in both engine branches, so the
        swap costs zero recompiles. Structure/shape must match exactly;
        a different fusion geometry needs a new engine (restart)."""
        from devit_tpu.io.checkpoint import restore_pytree

        ckpt = restore_pytree(ens_path, None)
        if not isinstance(ckpt, dict):  # a valid msgpack of the wrong thing
            raise ValueError(
                f"{ens_path!r} is not a checkpoint dict "
                f"(restored {type(ckpt).__name__})")
        new = {"params": ckpt.get("ens_params", ckpt.get("params", ckpt))}
        # shape AND dtype must match: the AOT engine branch dispatches
        # pre-lowered Compiled executables that are aval-strict — a same-shape
        # bf16 head swapped into an f32 engine would pass a shape-only guard
        # and then fail EVERY subsequent dispatch until restart (the closure
        # branch merely recompiles, but the guard must cover both)
        aval = lambda x: (jnp.shape(x), jnp.result_type(x))
        old_s = jax.tree_util.tree_map(aval, self._ens_vars)
        new_s = jax.tree_util.tree_map(aval, new)
        if old_s != new_s:
            raise ValueError(
                f"reload checkpoint geometry (shape/dtype) differs from the "
                f"serving fusion head: {new_s} vs {old_s} — restart to "
                f"change geometry")
        new = self._commit_vars(new)
        with self._lock:  # never swap mid-dispatch
            self._ens_vars = new

    def warm_up(self) -> float:
        """Compile every bucket program before traffic (first tunnel compiles
        are 30-90 s — a serving daemon must not eat that mid-request)."""
        t0 = time.time()
        s = self.cfg.input_size
        for b in sorted(self.cfg.buckets):
            self.predict(np.zeros((b, s, s, 3), np.uint8))
        return time.time() - t0


def _host_resize(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision eval-transform geometry on the host (PIL):
    Resize(int(256/224*size), bicubic, shorter edge) + CenterCrop(size).
    Host, not device: arbitrary client sizes must never compile a new XLA
    program (data/get_dataset.py:99-109 semantics; device path does the same
    math for pre-sized batches in data/pipeline.eval_transform)."""
    from PIL import Image

    if img.shape[0] == size and img.shape[1] == size:
        return img
    # the same arithmetic as ingest_resize / pipeline.resize_center_crop:
    # long side int-TRUNCATED, crop offsets int(round(.../2)) — torchvision
    scale = int(256 / 224 * size)
    im = Image.fromarray(img)
    w, h = im.size
    if w <= h:
        nw, nh = scale, int(scale * h / w)
    else:
        nh, nw = scale, int(scale * w / h)
    im = im.resize((nw, nh), Image.BICUBIC)
    left = int(round((nw - size) / 2.0))
    top = int(round((nh - size) / 2.0))
    return np.asarray(im.crop((left, top, left + size, top + size)),
                      dtype=np.uint8)


class MicroBatcher:
    """Single device-owner thread coalescing concurrent requests.

    Requests (uint8 (n,S,S,3), Future) enter a queue; the loop takes the
    oldest request, drains everything that arrives within `max_wait_ms` of it
    (up to the largest bucket), runs ONE engine.predict over the
    concatenation, and splits the logits back per request. One thread owning
    all dispatch is the correctness story (no interleaved device use) AND the
    throughput story (coalesced batches ride the bigger buckets)."""

    def __init__(self, engine: InferenceEngine):
        self.engine = engine
        self.q: "queue.Queue" = queue.Queue()
        self.stats = {
            "requests": 0, "images": 0, "batches": 0, "coalesced": 0,
        }
        self._latencies: deque = deque(maxlen=1024)  # seconds, per request
        self._lat_lock = threading.Lock()  # appends race /stats snapshots
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="devit-batcher")

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self.q.put(None)  # wake the blocking get
        if self._thread.is_alive():
            self._thread.join(timeout=10)
        # fail any request still queued: a waiter blocked in fut.result()
        # must get a prompt error, not a 600 s timeout
        while True:
            try:
                item = self.q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(RuntimeError("server shutting down"))

    def submit(self, images_u8: np.ndarray) -> Future:
        fut: Future = Future()
        self.q.put((images_u8, fut, time.time()))
        return fut

    def _loop(self):
        cap = max(self.engine.cfg.buckets)
        wait = self.engine.cfg.max_wait_ms / 1000.0
        while not self._stop.is_set():
            item = self.q.get()
            if item is None:
                continue
            group = [item]
            total = item[0].shape[0]
            deadline = item[2] + wait
            while total < cap:
                try:
                    # requests that queued up while the PREVIOUS batch was
                    # dispatching are ready at zero cost — always drain them,
                    # even past the oldest request's wait window (otherwise
                    # sustained load degenerates to batch-of-1 while the
                    # queue grows)
                    nxt = self.q.get_nowait()
                except queue.Empty:
                    timeout = deadline - time.time()
                    if timeout <= 0:
                        break
                    try:
                        nxt = self.q.get(timeout=timeout)
                    except queue.Empty:
                        break
                if nxt is None:
                    break
                group.append(nxt)
                total += nxt[0].shape[0]
            try:
                batch = (group[0][0] if len(group) == 1 else
                         np.concatenate([g[0] for g in group], axis=0))
                logits = self.engine.predict(batch)
            except Exception as e:  # deliver the failure to every waiter
                for _, fut, _ in group:
                    fut.set_exception(e)
                continue
            now = time.time()
            off = 0
            for imgs, fut, t0 in group:
                n = imgs.shape[0]
                fut.set_result(logits[off:off + n])
                off += n
                with self._lat_lock:
                    self._latencies.append(now - t0)
            self.stats["requests"] += len(group)
            self.stats["images"] += total
            self.stats["batches"] += 1
            self.stats["coalesced"] += len(group) > 1

    def snapshot(self) -> dict:
        with self._lat_lock:  # a concurrent append mid-sort raises
            lat = sorted(self._latencies)
        pct = (lambda p: round(lat[min(int(p * len(lat)), len(lat) - 1)] * 1e3, 3)
               ) if lat else (lambda p: None)
        out = dict(self.stats)
        out.update(latency_ms_p50=pct(0.50), latency_ms_p99=pct(0.99),
                   queue_depth=self.q.qsize())
        return out


def build_engine_from_artifacts(
    compact_path: str,
    ens_path: Optional[str] = None,
    *,
    num_divisions: Optional[int] = None,
    teacher_size: Optional[int] = 768,
    cfg: Optional[ServeConfig] = None,
    log: Optional[Callable[[str], None]] = print,
) -> InferenceEngine:
    """Load deploy-stage artifacts (`sub-dataset{i}/compact.msgpack` under
    compact_path) + the stage-5 fusion checkpoint, inferring the fusion
    geometry (num_classes / teacher_size / family) from the checkpoint's own
    shapes so serving needs no dataset access."""
    cfg = cfg or ServeConfig()
    if num_divisions is None:  # auto-discover contiguous sub-dataset{i}
        num_divisions = 0
        while os.path.exists(os.path.join(
                compact_path, f"sub-dataset{num_divisions}", "compact.msgpack")):
            num_divisions += 1
        if num_divisions == 0:
            raise FileNotFoundError(
                f"no sub-dataset0/compact.msgpack under {compact_path!r} — "
                "run `devit deploy` first")
    cms = [load_compact(os.path.join(compact_path, f"sub-dataset{i}",
                                     "compact.msgpack"))
           for i in range(num_divisions)]
    sub_size = cms[0].embed["pos_embed"].shape[-1]
    family = "deit" if cms[0].distilled else "vit"

    if ens_path:
        from devit_tpu.io.checkpoint import restore_pytree

        ckpt = restore_pytree(ens_path, None)
        ens_params = ckpt.get("ens_params", ckpt.get("params", ckpt))
        kc = np.asarray(ens_params["cls_classifier"]["kernel"])
        num_classes = int(kc.shape[-1])
        if "cls_mlp" in ens_params:
            km = np.asarray(ens_params["cls_mlp"]["kernel"])
            teacher_size = int(km.shape[-1])
            if km.shape[0] != num_divisions * sub_size:
                raise ValueError(
                    f"fusion checkpoint fuses {km.shape[0]} features but the "
                    f"compact artifacts provide {num_divisions}x{sub_size} — "
                    "wrong --ens-path / --compact-path pairing")
        else:
            teacher_size = None
        ck_family = "deit" if "dist_classifier" in ens_params else "vit"
        if ck_family != family:
            raise ValueError(
                f"fusion checkpoint is {ck_family!r} but compact backbones "
                f"are {family!r}")
        ens = EnsMLP(num_classes=num_classes, sub_size=sub_size,
                     num_divisions=num_divisions, teacher_size=teacher_size,
                     family=family, dtype=cfg.dtype)
        ens_vars = {"params": ens_params}
    else:
        # smoke mode only: random fusion head (same policy as
        # `ensemble --eval` without --ens-path) — predictions are meaningless
        if log:
            log("WARNING: no --ens-path; serving with a RANDOM fusion head "
                "(smoke mode, predictions are meaningless)")
        num_classes = int(np.asarray(
            cms[0].head["head"]["kernel"]).shape[-1]) if cms[0].head else 100
        ens = EnsMLP(num_classes=num_classes, sub_size=sub_size,
                     num_divisions=num_divisions, teacher_size=teacher_size,
                     family=family, dtype=cfg.dtype)
        tok = jnp.zeros((num_divisions, 2, sub_size))
        ens_vars = ens.init(jax.random.key(0), tok, tok)

    engine = InferenceEngine(cms, ens, ens_vars, cfg)
    if log:
        log(f"engine: {num_divisions} divisions (sub_size {sub_size}, "
            f"{family}), {engine.num_classes} classes, buckets "
            f"{sorted(cfg.buckets)}, divisions on "
            f"{[str(d) for d in engine.division_devices]}, fusion on "
            f"{engine.fusion_device}")
    return engine


class _Handler(BaseHTTPRequestHandler):
    # set per-server via build_server
    batcher: MicroBatcher = None
    engine: InferenceEngine = None
    started: float = 0.0
    quiet: bool = True

    def log_message(self, fmt, *args):  # stdlib default spams stderr per hit
        if not self.quiet:
            super().log_message(fmt, *args)

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        path = urlparse(self.path).path
        if path == "/healthz":
            e = self.engine
            self._json(200, {
                "status": "ok",
                "num_divisions": e.num_divisions,
                "num_classes": e.num_classes,
                "input_size": e.cfg.input_size,
                "buckets": sorted(e.cfg.buckets),
                "division_devices": [str(d) for d in e.division_devices],
                "fusion_device": str(e.fusion_device),
                "uptime_s": round(time.time() - self.started, 1),
            })
        elif path == "/stats":
            self._json(200, self.batcher.snapshot())
        else:
            self._json(404, {"error": f"unknown path {path!r}"})

    def do_POST(self):
        url = urlparse(self.path)
        if url.path == "/reload":
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                path = body.get("ens_path") if isinstance(body, dict) else None
                if not isinstance(path, str):
                    raise ValueError(
                        "body must be a JSON object with string 'ens_path'")
                self.engine.reload_fusion(path)
            except json.JSONDecodeError as e:
                return self._json(400, {"error": f"invalid JSON body: {e}"})
            except (ValueError, FileNotFoundError, OSError) as e:
                return self._json(400, {"error": str(e)})
            return self._json(200, {"status": "reloaded", "ens_path": path})
        if url.path != "/predict":
            return self._json(404, {"error": f"unknown path {url.path!r}"})
        t0 = time.time()
        try:
            shape = tuple(int(v) for v in
                          self.headers.get("X-Image-Shape", "").split(","))
            if len(shape) == 3:
                shape = (1,) + shape
            if len(shape) != 4 or shape[-1] != 3 or any(v <= 0 for v in shape):
                raise ValueError(
                    "X-Image-Shape must be 'N,H,W,3' or 'H,W,3' (uint8 RGB)")
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            expect = int(np.prod(shape))
            if len(raw) != expect:
                raise ValueError(
                    f"body is {len(raw)} bytes, shape {shape} needs {expect}")
            imgs = np.frombuffer(raw, np.uint8).reshape(shape)
            s = self.engine.cfg.input_size
            if imgs.shape[1] != s or imgs.shape[2] != s:
                imgs = np.stack([_host_resize(i, s) for i in imgs])
            q = parse_qs(url.query)
            topk = min(int(q.get("topk", [self.engine.cfg.topk])[0]),
                       self.engine.num_classes)
            if topk <= 0:
                raise ValueError("topk must be >= 1")
        except (ValueError, OverflowError) as e:
            return self._json(400, {"error": str(e)})
        try:
            logits = self.batcher.submit(imgs).result(timeout=600)
        except Exception as e:  # noqa: BLE001 — report, don't kill the worker
            return self._json(500, {"error": f"{type(e).__name__}: {e}"})
        # softmax + topk on the host: K floats per image, no device round-trip
        z = logits - logits.max(axis=-1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=-1, keepdims=True)
        idx = np.argsort(-logits, axis=-1)[:, :topk]
        self._json(200, {
            "predictions": [
                {"topk": r.tolist(),
                 "probs": np.round(p[i, r], 6).tolist()}
                for i, r in enumerate(idx)],
            "latency_ms": round((time.time() - t0) * 1e3, 3),
        })


def build_server(engine: InferenceEngine, host: str = "127.0.0.1",
                 port: int = 0, *, quiet: bool = True
                 ) -> Tuple[ThreadingHTTPServer, MicroBatcher]:
    """Wire engine + batcher into a ThreadingHTTPServer (not started).
    port=0 binds an ephemeral port (tests); callers run serve_forever()."""
    batcher = MicroBatcher(engine).start()
    handler = type("Handler", (_Handler,), {
        "batcher": batcher, "engine": engine, "started": time.time(),
        "quiet": quiet,
    })
    httpd = ThreadingHTTPServer((host, port), handler)
    return httpd, batcher


def serve_main(args) -> None:
    """`devit serve` entry point."""
    buckets = tuple(sorted({int(b) for b in args.buckets.split(",")}))
    if any(b <= 0 for b in buckets):
        raise ValueError(f"--buckets must be positive ints, got {args.buckets}")
    from devit_tpu.cli import common as C

    cfg = ServeConfig(
        input_size=args.input_size, patch_size=args.patch_size,
        buckets=buckets, max_wait_ms=args.max_wait_ms, topk=args.topk,
        dtype=C.dtype_from_args(args),
        use_pallas=getattr(args, "use_pallas", None),
        fast_math=not args.no_fast_math, warmup=not args.no_warmup,
        aot_cache={"auto": None, "on": True, "off": False}[
            getattr(args, "aot_cache", "auto")])
    engine = build_engine_from_artifacts(
        args.compact_path, args.ens_path,
        num_divisions=args.num_division if args.num_division > 0 else None,
        teacher_size=args.teacher_size, cfg=cfg)
    if cfg.warmup:
        print(f"warmup: compiling {len(buckets)} bucket programs ...",
              flush=True)
        dt = engine.warm_up()
        print(f"warmup done in {dt:.1f}s", flush=True)
    httpd, batcher = build_server(engine, args.host, args.port, quiet=False)
    host, port = httpd.server_address[:2]
    print(f"devit serving on http://{host}:{port} "
          f"(POST /predict, GET /healthz, GET /stats)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        # server_close, not shutdown(): shutdown() waits on the serve_forever
        # loop's exit event, which a KeyboardInterrupt mid-loop never sets
        httpd.server_close()
        batcher.stop()
