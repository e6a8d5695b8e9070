"""Checkpoint save/restore and torch-checkpoint ingestion.

Parity surface (SURVEY.md §5.4): the reference torch.save's
{model, optimizer, lr_scheduler, epoch, scaler, args} every epoch plus
best-accuracy weights-only checkpoints (train_subdata.py:450-459, 476-484),
EMA state (distill_sub.py:425-433), and ingests timm/.pth state dicts and
Flax .npz ViTs (de_vit.py:372-449) with bicubic pos-embed resize
(de_vit.py:452-473).

Here checkpoints are orbax (if available) or msgpack pytrees with the same
logical contents, and `load_torch_vit` converts a reference-layout torch
state_dict (including the deleted-heads positional copy of ensemble.py's
dict_map) into our scan-stacked parameter pytree.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax


def save_pytree(path: str, tree: Any) -> None:
    """Atomic msgpack save: write to a tmp file, then os.replace. A naive
    in-place open(path,'wb') truncates the previous epoch's good checkpoint
    the instant the write starts, so a crash mid-write (the exact event
    checkpointing guards against) would destroy the only resume artifact."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(flax.serialization.to_bytes(tree))
    os.replace(tmp, path)


def restore_pytree(path: str, template: Any) -> Any:
    """Restore with a template (exact treedef) or, with template=None, as raw
    nested dicts via msgpack_restore. Orbax checkpoint directories (written
    by save_pytree_orbax) are detected and dispatched transparently, so
    --resume works with either format."""
    if os.path.isdir(path) or os.path.isdir(path + ".new"):
        # '.new': a durable orbax write whose promotion was cut by a crash
        return restore_pytree_orbax(path, template)
    if not os.path.exists(path) and path.endswith(".msgpack"):
        # --ckpt-format orbax rewrites '.msgpack' -> '.orbax' on save; accept
        # the documented .msgpack artifact name on restore too
        sibling = path[: -len(".msgpack")] + ".orbax"
        if os.path.isdir(sibling) or os.path.isdir(sibling + ".new"):
            return restore_pytree_orbax(sibling, template)
    with open(path, "rb") as f:
        data = f.read()
    if template is None:
        return flax.serialization.msgpack_restore(data)
    return flax.serialization.from_bytes(template, data)


# ------------------------------------------------------- orbax backend

_ORBAX_CKPTR = None


def _orbax():
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp

        _ORBAX_CKPTR = ocp.StandardCheckpointer()
    return _ORBAX_CKPTR


_PENDING_PROMOTE = set()


def _promote_orbax(path: str) -> None:
    """Promote a durable '<path>.new' write over <path>. Orbax writes into a
    '*.orbax-checkpoint-tmp-*' directory and renames it on commit, so the
    existence of '<path>.new' as a plain directory already implies a
    COMPLETE write — the rmtree+replace here swaps whole valid checkpoints."""
    new = path + ".new"
    if os.path.isdir(new):
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        os.replace(new, path)


def save_pytree_orbax(path: str, tree: Any) -> None:
    """Async Orbax save (production checkpointing: training continues while
    the write flushes; call wait_for_checkpoints() before reading back or
    exiting). `path` becomes a checkpoint DIRECTORY.

    Two-phase write: the async save goes to '<path>.new'; the durable .new
    is promoted over <path> on the NEXT save (or wait_for_checkpoints).
    A direct save(path, force=True) would rmtree the LIVE checkpoint in the
    blocking phase while the tmp->final commit rename happens minutes later
    in the background thread — every epoch would have a window with ZERO
    restorable checkpoint on disk. restore transparently picks up an
    unpromoted .new after a crash."""
    import jax

    path = os.path.abspath(path)
    tree = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if np.isscalar(x) or isinstance(x, (int, float)) else x,
        tree,
    )
    ckptr = _orbax()
    # the previous .new (if any) is durable once save() returns control to a
    # new save — orbax serializes in-flight writes; make it the live ckpt
    ckptr.wait_until_finished()
    _promote_orbax(path)
    # force=True only ever clobbers a stale uncommitted .new from a crash
    ckptr.save(path + ".new", tree, force=True)
    _PENDING_PROMOTE.add(path)


def restore_pytree_orbax(path: str, template: Any = None) -> Any:
    ckptr = _orbax()
    ckptr.wait_until_finished()
    path = os.path.abspath(path)
    # crash-between-commit-and-promotion recovery: restore DIRECTLY from the
    # durable .new — restore must stay read-only (concurrent restorers
    # promoting would race each other's rmtree/replace into zero remaining
    # checkpoints, and read-only mounts must still restore). The writer
    # promotes it on its next save/wait.
    if os.path.isdir(path + ".new"):
        path = path + ".new"
    if template is None:
        return ckptr.restore(path)
    import jax

    # shape/dtype are metadata reads — np.asarray here would materialize
    # every (possibly device-resident) template leaf on the host just to
    # read its dtype, a full-model D2H sweep per resume
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            np.shape(x), getattr(x, "dtype", None) or np.asarray(x).dtype),
        template,
    )
    return ckptr.restore(path, abstract)


def wait_for_checkpoints() -> None:
    """Block until pending async Orbax writes are durable, then promote them
    to their documented paths (save_pytree_orbax's two-phase scheme)."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()
    while _PENDING_PROMOTE:
        _promote_orbax(_PENDING_PROMOTE.pop())


# ------------------------------------------------------- torch ingestion


def _to_np(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth file without requiring CUDA; unwraps the {'model': ...}
    nesting deit checkpoints use (de_vit.py:479-481)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict):
        for key in ("model", "state_dict"):  # common checkpoint wrappers
            if isinstance(sd.get(key), dict):
                sd = sd[key]
                break
    return {k: _to_np(v) for k, v in sd.items() if hasattr(v, "shape")}


def torch_vit_to_params(
    sd: Dict[str, np.ndarray], depth: int
) -> Dict:
    """Reference-layout ViT state_dict -> our scan-stacked param pytree.

    Key mapping (reference de_vit.py module tree -> devit_tpu/models/vit.py):
      patch_embed.proj.{weight (D,3,p,p), bias} -> patch_embed.{kernel (p*p*3,D), bias}
          torch conv flattens (c, ph, pw); our patchify flattens (ph, pw, c),
          so the conv kernel is transposed to HWC-major before reshape.
      cls_token/dist_token/pos_embed -> same names
      blocks.{i}.norm1.{weight,bias} -> blocks.norm1.{scale,bias}[i]  (stacked)
      blocks.{i}.attn.qkv.{weight,bias} -> blocks.qkv.{kernel.T, bias}[i]
      blocks.{i}.attn.proj, mlp.fc1, mlp.fc2 -> blocks.{proj,fc1,fc2}[i]
      norm.{weight,bias} -> norm.{scale,bias}
      head/head_dist -> head/head_dist (skipped if absent, e.g. deleted heads
          in ensemble checkpoints, ensemble.py:28-30)
      resize_mlp / resize_att_mlp / resize_encoder_mlp -> same names
    """

    def lin(prefix):
        w = sd[f"{prefix}.weight"]
        out = {"kernel": np.transpose(w)}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    def stack(fn):
        per_layer = [fn(i) for i in range(depth)]
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per_layer)

    conv_w = sd["patch_embed.proj.weight"]  # (D, C, p, p)
    D, C, p, _ = conv_w.shape
    patch_kernel = conv_w.transpose(2, 3, 1, 0).reshape(p * p * C, D)

    params: Dict[str, Any] = {
        "patch_embed": {"kernel": patch_kernel, "bias": sd["patch_embed.proj.bias"]},
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": ln("norm"),
        "blocks": {
            "norm1": stack(lambda i: ln(f"blocks.{i}.norm1")),
            "qkv": stack(lambda i: lin(f"blocks.{i}.attn.qkv")),
            "proj": stack(lambda i: lin(f"blocks.{i}.attn.proj")),
            "norm2": stack(lambda i: ln(f"blocks.{i}.norm2")),
            "fc1": stack(lambda i: lin(f"blocks.{i}.mlp.fc1")),
            "fc2": stack(lambda i: lin(f"blocks.{i}.mlp.fc2")),
        },
    }
    if "dist_token" in sd:
        params["dist_token"] = sd["dist_token"]
    for name in ("head", "head_dist", "resize_mlp", "resize_att_mlp", "resize_encoder_mlp"):
        if f"{name}.weight" in sd:
            params[name] = lin(name)
    return params


def params_to_torch_vit(params: Dict, depth: int) -> Dict[str, np.ndarray]:
    """Inverse of torch_vit_to_params: our scan-stacked ViT param pytree ->
    a reference-layout state_dict (numpy values; `torch.from_numpy` each value
    to load_state_dict into the reference's de_vit.VisionTransformer).

    Interop surface: export our checkpoints back to the torch ecosystem, and
    the composed cross-framework pipeline-parity harness (tests/
    test_chain_parity.py) which feeds OUR stage artifacts through the
    reference's own rank/mask/train machinery."""
    params = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
    sd: Dict[str, np.ndarray] = {}

    def lin(prefix, tree):
        sd[f"{prefix}.weight"] = np.transpose(tree["kernel"])
        if "bias" in tree:
            sd[f"{prefix}.bias"] = tree["bias"]

    def ln(prefix, tree):
        sd[f"{prefix}.weight"] = tree["scale"]
        sd[f"{prefix}.bias"] = tree["bias"]

    pk = params["patch_embed"]["kernel"]  # (p*p*C, D)
    D = pk.shape[1]
    C = 3
    p = int(round((pk.shape[0] // C) ** 0.5))
    sd["patch_embed.proj.weight"] = pk.reshape(p, p, C, D).transpose(3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = params["patch_embed"]["bias"]
    for name in ("cls_token", "dist_token", "pos_embed"):
        if name in params:
            sd[name] = params[name]
    ln("norm", params["norm"])
    blocks = params["blocks"]
    for i in range(depth):
        sl = jax.tree_util.tree_map(lambda x: x[i], blocks)
        ln(f"blocks.{i}.norm1", sl["norm1"])
        lin(f"blocks.{i}.attn.qkv", sl["qkv"])
        lin(f"blocks.{i}.attn.proj", sl["proj"])
        ln(f"blocks.{i}.norm2", sl["norm2"])
        lin(f"blocks.{i}.mlp.fc1", sl["fc1"])
        lin(f"blocks.{i}.mlp.fc2", sl["fc2"])
    for name in ("head", "head_dist", "resize_mlp", "resize_att_mlp",
                 "resize_encoder_mlp"):
        if name in params:
            lin(name, params[name])
    return sd


def torch_cct_to_params(
    sd: Dict[str, np.ndarray], num_layers: int, n_conv_layers: int
) -> Dict:
    """Reference-layout CCT state_dict -> our scan-stacked CCT param pytree.

    Key mapping (reference models/cct.py + models/utils/transformers.py +
    models/utils/tokenizer.py -> devit_tpu/models/cct.py):
      tokenizer.conv_layers.{i}.0.weight (O,I,kh,kw) -> tokenizer.conv{i}.kernel (kh,kw,I,O)
      classifier.blocks.{i}.{pre_norm, self_attn.qkv, self_attn.proj, norm1,
          linear1, linear2} -> blocks.{pre_norm, qkv, proj, norm1, linear1,
          linear2}[i] (stacked along the scan axis)
      classifier.{norm, attention_pool, fc, class_emb, positional_emb} -> same
      names (positional_emb only meaningful for 'learnable'; the sine PE is
      computed, not stored). Headless checkpoints use the 'encoders.' prefix
      (CCTTransformer, cct.py:102-116) — handled transparently.
    """
    pre = "classifier." if any(k.startswith("classifier.") for k in sd) else "encoders."

    def lin(name):
        out = {"kernel": np.transpose(sd[f"{name}.weight"])}
        if f"{name}.bias" in sd:
            out["bias"] = sd[f"{name}.bias"]
        return out

    def ln(name):
        return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}

    def stack(fn):
        per = [fn(i) for i in range(num_layers)]
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per)

    params: Dict[str, Any] = {
        "tokenizer": {
            f"conv{i}": {
                "kernel": sd[f"tokenizer.conv_layers.{i}.0.weight"].transpose(2, 3, 1, 0)
            }
            for i in range(n_conv_layers)
        },
        "blocks": {
            "pre_norm": stack(lambda i: ln(f"{pre}blocks.{i}.pre_norm")),
            "qkv": stack(lambda i: lin(f"{pre}blocks.{i}.self_attn.qkv")),
            "proj": stack(lambda i: lin(f"{pre}blocks.{i}.self_attn.proj")),
            "norm1": stack(lambda i: ln(f"{pre}blocks.{i}.norm1")),
            "linear1": stack(lambda i: lin(f"{pre}blocks.{i}.linear1")),
            "linear2": stack(lambda i: lin(f"{pre}blocks.{i}.linear2")),
        },
        "norm": ln(f"{pre}norm"),
    }
    if f"{pre}attention_pool.weight" in sd:
        params["attention_pool"] = lin(f"{pre}attention_pool")
    if f"{pre}class_emb" in sd:
        params["class_emb"] = sd[f"{pre}class_emb"]
    if f"{pre}positional_emb" in sd:
        params["positional_emb"] = sd[f"{pre}positional_emb"]
    if f"{pre}fc.weight" in sd:
        params["fc"] = lin(f"{pre}fc")
    if "resize.weight" in sd:
        params["resize"] = lin("resize")
    return params


def _torch_cubic_weight(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """torch F.interpolate bicubic kernel (cubic convolution, A=-0.75 —
    NOT the Keys a=-0.5 spline jax.image.resize uses)."""
    t = np.abs(t)
    return np.where(t <= 1, ((A + 2) * t - (A + 3)) * t * t + 1,
                    np.where(t < 2, ((A * t - 5 * A) * t + 8 * A) * t - 4 * A,
                             0.0))


def _torch_resize_1d(x: np.ndarray, out_len: int, axis: int,
                     kind: str) -> np.ndarray:
    """One separable axis of torch F.interpolate(align_corners=False,
    antialias off): half-pixel source coords, edge-clamped taps. Bit-matches
    torch bicubic/bilinear at f32 (verified against F.interpolate on up- and
    downscales; jax.image.resize 'cubic' differs on every resize because of
    its a=-0.5 kernel, and its default antialias diverges on downscale —
    the 224px-checkpoint-into-32px-model path)."""
    in_len = x.shape[axis]
    src = (np.arange(out_len) + 0.5) * in_len / out_len - 0.5
    i0 = np.floor(src).astype(int)
    taps = range(-1, 3) if kind == "cubic" else range(0, 2)
    out = 0.0
    for k in taps:
        idx = np.clip(i0 + k, 0, in_len - 1)
        if kind == "cubic":
            w = _torch_cubic_weight(src - (i0 + k))
        else:  # linear tent kernel
            w = np.maximum(0.0, 1.0 - np.abs(src - (i0 + k)))
        shape = [1] * x.ndim
        shape[axis] = out_len
        out = out + np.take(x, idx, axis=axis) * w.reshape(shape)
    return out


def _resize_pe_grid(pos_embed: np.ndarray, new_seq_len: int,
                    num_prefix_tokens: int, *, method: str,
                    family: str) -> np.ndarray:
    """Shared pos-embed grid resize (the ViT and CCT wrappers below differ
    only in interpolation method; one body so they cannot drift — they
    previously diverged on antialias)."""
    tok = pos_embed[:, :num_prefix_tokens]
    grid = np.asarray(pos_embed[0, num_prefix_tokens:], np.float64)
    gs_old = int(np.sqrt(grid.shape[0]))
    gs_new = int(np.sqrt(new_seq_len - num_prefix_tokens))
    if gs_old * gs_old != grid.shape[0] or gs_new * gs_new != new_seq_len - num_prefix_tokens:
        # not a square patch grid after stripping THIS model's prefix tokens —
        # usually a prefix-count mismatch (e.g. a distilled 198-token ckpt
        # into an undistilled 197-token model, or a class-token CCT ckpt into
        # a seq-pool model: 197 and 196 truncate to the same int(sqrt));
        # resizing would silently misalign every token
        raise ValueError(
            f"{family} pos-embed grid not square: ckpt {grid.shape[0]} "
            f"tokens, target {new_seq_len - num_prefix_tokens} (prefix "
            f"{num_prefix_tokens}) — prefix-token mismatch?")
    if gs_old == gs_new:
        return pos_embed
    grid = grid.reshape(1, gs_old, gs_old, -1)
    grid = _torch_resize_1d(_torch_resize_1d(grid, gs_new, 1, method),
                            gs_new, 2, method)
    grid = grid.astype(np.float32).reshape(1, gs_new * gs_new, -1)
    return np.concatenate([tok, grid], axis=1)


def resize_pos_embed(
    pos_embed: np.ndarray, new_seq_len: int, num_prefix_tokens: int = 1
) -> np.ndarray:
    """Bicubic grid resize of position embeddings (de_vit.py:452-473:
    F.interpolate(mode='bicubic', align_corners=False), NO antialias)."""
    return _resize_pe_grid(pos_embed, new_seq_len, num_prefix_tokens,
                           method="cubic", family="ViT")


def resize_cct_pos_embed(
    pos_embed: np.ndarray, new_seq_len: int, num_prefix_tokens: int = 0
) -> np.ndarray:
    """Bilinear grid resize of CCT learnable positional embeddings
    (reference models/utils/helpers.py:26-32 `pe_check`, which calls
    resize_pos_embed with mode='bilinear'; num_tokens is 0 under seq-pool,
    1 with a class token). Loading a 224px CCT checkpoint into a 32px model
    must land the RESIZED pretrained PE, not the random init."""
    return _resize_pe_grid(pos_embed, new_seq_len, num_prefix_tokens,
                           method="linear", family="CCT")


def load_flax_npz_vit(path: str, depth: int) -> Dict:
    """Google-Brain Flax .npz ViT checkpoints (de_vit.py:372-449) -> our pytree."""
    w = np.load(path)
    prefix = "opt/target/" if "opt/target/embedding/kernel" in w else ""

    def g(name):
        return w[f"{prefix}{name}"]

    emb_k = g("embedding/kernel")  # (p, p, C, D) already HWC-major
    p, _, C, D = emb_k.shape

    def block(i):
        bp = f"Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_1/"
        qkv_k = np.concatenate(
            [g(f"{mha}{n}/kernel").reshape(D, -1) for n in ("query", "key", "value")], axis=1
        )
        qkv_b = np.concatenate(
            [g(f"{mha}{n}/bias").reshape(-1) for n in ("query", "key", "value")]
        )
        return {
            "norm1": {"scale": g(f"{bp}LayerNorm_0/scale"), "bias": g(f"{bp}LayerNorm_0/bias")},
            "qkv": {"kernel": qkv_k, "bias": qkv_b},
            "proj": {
                "kernel": g(f"{mha}out/kernel").reshape(-1, D),
                "bias": g(f"{mha}out/bias"),
            },
            "norm2": {"scale": g(f"{bp}LayerNorm_2/scale"), "bias": g(f"{bp}LayerNorm_2/bias")},
            "fc1": {"kernel": g(f"{bp}MlpBlock_3/Dense_0/kernel"),
                    "bias": g(f"{bp}MlpBlock_3/Dense_0/bias")},
            "fc2": {"kernel": g(f"{bp}MlpBlock_3/Dense_1/kernel"),
                    "bias": g(f"{bp}MlpBlock_3/Dense_1/bias")},
        }

    blocks = [block(i) for i in range(depth)]
    params = {
        "patch_embed": {"kernel": emb_k.reshape(p * p * C, D), "bias": g("embedding/bias")},
        "cls_token": g("cls"),
        "pos_embed": g("Transformer/posembed_input/pos_embedding"),
        "norm": {"scale": g("Transformer/encoder_norm/scale"),
                 "bias": g("Transformer/encoder_norm/bias")},
        "blocks": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks),
    }
    if f"{prefix}head/kernel" in w:
        params["head"] = {"kernel": g("head/kernel"), "bias": g("head/bias")}
    return params
