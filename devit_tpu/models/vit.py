"""TPU-native decomposable Vision Transformer.

Re-expresses the capabilities of the reference's `models/de_vit.py` (decomposable
student, gates at de_vit.py:33,63) and `models/deit_vit.py` (multi-output
teachers) as one functional flax model:

- Blocks are stacked with `nn.scan`, so every parameter carries a leading depth
  axis. Per-layer attention-head gates `(depth, heads)` and MLP-neuron gates
  `(depth, hidden)` are plain input arrays threaded into the scan — the
  functional equivalent of the reference's in-place `x.mul_(gate)` hooks
  (de_vit.py:43,79) — and division-stacking for the ensemble is a single
  `jax.vmap` over the parameter pytree.
- QKV capture for DEKD (engine.py:91-92 uses only the middle layer) is done
  with an O(1)-memory select inside the scan carry instead of stacking all
  layers' Q/K/V in HBM; `capture_qkv='all'` still stacks everything for API
  parity with `output_qkv=True` (de_vit.py:86).
- Compute dtype is bf16 by default with fp32 LayerNorm/softmax; params stay
  fp32. This replaces the reference's CUDA AMP + NativeScaler (bf16 needs no
  loss scaling — documented deviation).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from devit_tpu.configs import ViTConfig, get_vit_config

Array = jax.Array

def _torch_trunc_normal(stddev: float):
    """torch.nn.init.trunc_normal_(std=s) semantics: the truncation bounds
    a=-2, b=2 are ABSOLUTE (i.e. ±2/s sigmas — effectively untruncated for
    s << 1), unlike jax truncated_normal whose ±2 are in sigma units and
    shrink the effective std to ~0.88s. Matches de_vit.py:214-216 init."""

    def init(key, shape, dtype=jnp.float32):
        return jnp.clip(stddev * jax.random.normal(key, shape, dtype), -2.0, 2.0)

    return init


trunc_init = _torch_trunc_normal(0.02)


def drop_path(x: Array, rate: Array, rng) -> Array:
    """Stochastic depth on a residual branch (timm DropPath semantics,
    reference models/utils/stochastic_depth.py:8-39). `rate` is a traced
    per-layer scalar (linspace over depth). Shared by ViT Block and CCTLayer."""
    B = x.shape[0]
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (B, 1, 1)).astype(x.dtype)
    return x * mask / jnp.maximum(keep, 1e-8).astype(x.dtype)


class Gates(NamedTuple):
    """Structural-shrink masks. 1.0 = keep, 0.0 = pruned.

    `head`:   (depth, num_heads)  — attention-head gate (de_vit.py:63,79)
    `neuron`: (depth, hidden_dim) — MLP-neuron gate     (de_vit.py:33,43)
    """

    head: Array
    neuron: Array


def full_gates(cfg: ViTConfig, dtype=jnp.float32) -> Gates:
    return Gates(
        head=jnp.ones((cfg.depth, cfg.num_heads), dtype),
        neuron=jnp.ones((cfg.depth, cfg.hidden_dim), dtype),
    )


class ViTOutput(NamedTuple):
    """Everything a forward can emit. Unused fields are None; under jit XLA
    dead-code-eliminates whatever the caller does not consume."""

    logits: Array  # eval-style logits: (cls+dist)/2 for distilled models
    cls_logits: Optional[Array] = None
    dist_logits: Optional[Array] = None
    cls_feat: Optional[Array] = None  # post-norm CLS token (B, C)
    dist_feat: Optional[Array] = None  # post-norm dist token (B, C) (distilled only)
    last_tokens: Optional[Any] = None  # resize_mlp-projected features for token distill
    qkv: Optional[Array] = None  # (L,3,B,H,N,dh) if capture_qkv='all', (3,B,H,N,dh) if 'middle'
    attn: Optional[Array] = None  # (L,B,N,C or resize_dim) per-block attention outputs
    encoders: Optional[Array] = None  # (L,B,N,C or resize_dim) per-block encoder outputs
    embedding: Optional[Array] = None  # (B,N,C or resize_dim) post-pos-embed tokens
    neuron_act: Optional[Array] = None  # (L,B,N,hidden) post-GELU pre-gate (imp_rank.py:31)
    head_out: Optional[Array] = None  # (L,B,N,H,dh) pre-gate head outputs (imp_rank.py:108)


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float,
                stat_dtype=jnp.float32) -> Array:
    """LayerNorm with fp32 statistics by default (stat_dtype=bf16 for
    inference-speed mode)."""
    dtype = x.dtype
    xs = x.astype(stat_dtype)
    mean = jnp.mean(xs, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xs - mean), axis=-1, keepdims=True)
    y = (xs - mean) * jax.lax.rsqrt(var + jnp.asarray(eps, stat_dtype))
    y = y * scale.astype(stat_dtype) + bias.astype(stat_dtype)
    return y.astype(dtype)


def fast_erf(x: Array) -> Array:
    """erf via Abramowitz–Stegun 7.1.26 (exp-based rational approximation,
    max abs error 1.5e-7 ≈ f32 eps — bitwise-indistinguishable from exact erf
    at bf16 activation precision).

    Exists because XLA:TPU lowers `erf` to a VPU polynomial that MEASURED
    ~63 ms of the 186 ms deployed-ensemble forward at bs512 (34% of total
    serving time, more than all weight matmuls) while `exp`/`tanh` are
    hardware-fast (~2 ms for the same element count). Same math as the
    reference's exact-erf GELU (de_vit.py:38 via nn.GELU), just a fast
    lowering."""
    xf = x.astype(jnp.float32)
    z = jnp.abs(xf)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    e = 1.0 - poly * jnp.exp(-z * z)
    return (jnp.sign(xf) * e).astype(x.dtype)


def fast_gelu(x: Array) -> Array:
    """Exact-erf GELU with the fast erf lowering (see fast_erf)."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + fast_erf(xf * 0.7071067811865476))).astype(x.dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-6
    stat_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return _layer_norm(x, scale, bias, self.eps, self.stat_dtype)


class PatchEmbed(nn.Module):
    """Patchify as reshape + one matmul (MXU-friendly; equivalent to the
    stride-p conv the reference inherits from timm PatchEmbed)."""

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        p, g = cfg.patch_size, cfg.grid_size
        B = x.shape[0]
        kernel = self.param(
            "kernel", trunc_init, (p * p * cfg.in_chans, cfg.embed_dim), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (cfg.embed_dim,), jnp.float32)
        # (B, H, W, C) -> (B, gh, p, gw, p, C) -> (B, gh, gw, p, p, C) -> (B, N, p*p*C)
        x = x.reshape(B, g, p, g, p, cfg.in_chans)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, p * p * cfg.in_chans)
        x = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        return x + bias.astype(self.dtype)


class Block(nn.Module):
    """One pre-norm transformer block with head/neuron gates.

    Used under nn.scan: __call__ receives the carry and a tuple of per-layer
    inputs, and returns (carry, per-layer outputs).
    """

    cfg: ViTConfig
    deterministic: bool = True
    capture_qkv: str = "none"  # 'none' | 'all' | 'middle'
    capture_layer: int = -1  # layer index captured when capture_qkv == 'middle'
    capture_block_outputs: bool = False  # att/encoder outputs (de_vit.py:268-284)
    capture_rank_stats: bool = False  # neuron_act/head_out for HSIC ranking
    dtype: Any = jnp.bfloat16
    # attention softmax stays f32 under EVERY flag combination, matching the
    # fused Pallas kernel (f32 QK^T + f32 softmax, probs rounded to dtype) —
    # a softmax precision that depended on use_pallas would make the flag
    # numerics-visible. fast_math flips only LN statistics + GELU lowering.
    softmax_dtype: Any = jnp.float32
    norm_dtype: Any = jnp.float32
    use_pallas: bool = False  # fused attention kernel (inference path)
    fast_math: bool = False  # tanh GELU lowering (deviation < bf16 rounding)

    @nn.compact
    def __call__(self, carry, per_layer):
        cfg = self.cfg
        x, qkv_slot = carry
        head_gate, neuron_gate, dp_rate, layer_idx = per_layer
        B, N, C = x.shape
        H, dh = cfg.num_heads, cfg.head_dim
        A = cfg.attn_dim  # == C unless compacted (core/compact.py)

        # ---- attention ----
        h = LayerNorm(eps=cfg.layer_norm_eps, stat_dtype=self.norm_dtype, name="norm1")(x)
        qkv_raw = nn.Dense(
            3 * A, use_bias=cfg.qkv_bias, dtype=self.dtype,
            kernel_init=trunc_init, name="qkv",
        )(h)

        # The Pallas fused kernel handles the common inference shape: no qkv /
        # rank-stat capture, no attention dropout. Everything else uses the
        # XLA path (autodiff'd for training).
        needs_capture = self.capture_qkv != "none" or self.capture_rank_stats
        pallas_ok = (
            self.use_pallas and not needs_capture
            and (self.deterministic or cfg.attn_drop_rate == 0)
        )
        if pallas_ok:
            q = k = v = None
            head_out = None
            # custom-VJP kernel: forward is the fused kernel; backward
            # recomputes the probabilities (flash-style), so this path is
            # usable for training too and always differentiable.
            from devit_tpu.kernels.attention import make_trainable_attention

            attn_out = make_trainable_attention(H)(qkv_raw)
            # named so remat_policy='dots_and_attn' can save it (pallas
            # outputs are invisible to the dot-based checkpoint policies)
            from jax.ad_checkpoint import checkpoint_name

            attn_out = checkpoint_name(attn_out, "attn_out")
            # head gate outside the kernel (fuses into the next elementwise)
            attn_out = attn_out * jnp.repeat(
                head_gate.astype(self.dtype), dh
            )[None, None, :]
        else:
            qkv = qkv_raw.reshape(B, N, 3, H, dh).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]

            logits = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=self.softmax_dtype
            ) * jnp.asarray(dh ** -0.5, self.softmax_dtype)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            if cfg.attn_drop_rate > 0 and not self.deterministic:
                probs = nn.Dropout(cfg.attn_drop_rate, deterministic=False)(probs)
            attn_out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)  # (B,H,N,dh)

            head_out = attn_out.transpose(0, 2, 1, 3) if self.capture_rank_stats else None

            # Head gate before the output projection (de_vit.py:77-79).
            attn_out = attn_out * head_gate.astype(self.dtype)[None, :, None, None]
            attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, N, A)
        attn_out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_init, name="proj")(attn_out)
        if cfg.drop_rate > 0 and not self.deterministic:
            attn_out = nn.Dropout(cfg.drop_rate, deterministic=False)(attn_out)

        x = x + self._drop_path(attn_out, dp_rate)

        # ---- MLP ----
        h = LayerNorm(eps=cfg.layer_norm_eps, stat_dtype=self.norm_dtype, name="norm2")(x)
        h = nn.Dense(cfg.hidden_dim, dtype=self.dtype, kernel_init=trunc_init, name="fc1")(h)
        # exact-erf GELU with the fast lowering (see fast_erf); inference
        # fast-math uses the hardware tanh lowering like compact_forward does
        h = jax.nn.gelu(h, approximate=True) if self.fast_math else fast_gelu(h)
        if cfg.drop_rate > 0 and not self.deterministic:
            h = nn.Dropout(cfg.drop_rate, deterministic=False)(h)
        neuron_act = h if self.capture_rank_stats else None
        # Neuron gate between activation and fc2 (de_vit.py:41-43).
        h = h * neuron_gate.astype(self.dtype)[None, None, :]
        h = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_init, name="fc2")(h)
        if cfg.drop_rate > 0 and not self.deterministic:
            h = nn.Dropout(cfg.drop_rate, deterministic=False)(h)

        x = x + self._drop_path(h, dp_rate)

        # ---- captures ----
        outs = {}
        if self.capture_qkv == "all":
            outs["qkv"] = jnp.stack([q, k, v])
        elif self.capture_qkv == "middle":
            hit = (layer_idx == self.capture_layer)
            qkv_slot = jnp.where(hit, jnp.stack([q, k, v]).astype(qkv_slot.dtype), qkv_slot)
        if self.capture_block_outputs:
            # Reference Block returns the attention branch output as 'attention'
            # (de_vit.py:119 — att_outputs['output'], i.e. post-proj, pre-residual).
            outs["attn"] = attn_out
            outs["encoder"] = x
        if self.capture_rank_stats:
            outs["neuron_act"] = neuron_act
            outs["head_out"] = head_out
        return (x, qkv_slot), outs

    def _drop_path(self, x: Array, rate: Array) -> Array:
        if self.deterministic:
            return x
        return drop_path(x, rate, self.make_rng("dropout"))


class VisionTransformer(nn.Module):
    """Functional (De)ViT/DeiT with multi-output forward.

    Parity surface (reference de_vit.py:124-334, deit_vit.py):
    - distilled dual heads: train -> (cls_logits, dist_logits), eval -> mean
    - optional resize heads to a wider teacher width (resize_dim)
    - capture of qkv / attention / encoder outputs / embedding
    - head & neuron gates threaded through every block
    """

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    # inference-speed mode: bf16 LayerNorm statistics + tanh GELU lowering.
    # Attention softmax stays f32 under every flag combination (kernel
    # parity — see Block.softmax_dtype). Enforced INFERENCE-only: a call
    # with train=True keeps f32 stats and erf GELU regardless (the bf16
    # analogue of the reference's AMP policy, which kept softmax/LN fp32).
    fast_math: bool = False
    use_pallas: bool = False  # fused attention kernel on the inference path
    # Rematerialize block activations in the backward pass (jax.checkpoint on
    # the scanned Block). Without it the full-size train step at bs256 needs
    # ~21 GB of residuals and OOMs 16 GB HBM; with it, residuals are one
    # (B,N,C) carry per layer. No effect on forward-only programs.
    use_remat: bool = True
    # Selective rematerialization: name of a jax.checkpoint_policies entry
    # ('dots_saveable', 'dots_with_no_batch_dims_saveable', ...) or
    # 'dots_and_attn' = dots_saveable + the fused-attention kernel output
    # (which is a pallas_call, not a dot, so dot policies alone recompute
    # it). None = full remat (save only the carry).
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        gates: Optional[Gates] = None,
        *,
        train: bool = False,
        capture_qkv: str = "none",  # 'none' | 'all' | 'middle'
        capture_layer: Optional[int] = None,
        capture_block_outputs: bool = False,
        capture_embedding: bool = False,
        capture_rank_stats: bool = False,
        distill_token: bool = False,
        features_only: bool = False,
    ) -> ViTOutput:
        cfg = self.cfg
        B = x.shape[0]
        C = cfg.embed_dim

        if gates is None:
            gates = full_gates(cfg)
        if capture_layer is None:
            # DEKD uses the middle layer: qkvs[depth//2 - 1] (engine.py:91-92).
            # The reference indexes a Python list, so depth==1 wraps to the
            # LAST (only) layer via negative indexing; mirror that — a bare
            # -1 would never match layer_idx and the capture slot would
            # silently stay all-zeros.
            capture_layer = (cfg.depth // 2 - 1) % cfg.depth

        x = PatchEmbed(cfg, dtype=self.dtype, name="patch_embed")(x)

        cls_token = self.param("cls_token", trunc_init, (1, 1, C), jnp.float32)
        tokens = [jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, C))]
        if cfg.distilled:
            dist_token = self.param("dist_token", trunc_init, (1, 1, C), jnp.float32)
            tokens.append(jnp.broadcast_to(dist_token.astype(self.dtype), (B, 1, C)))
        x = jnp.concatenate(tokens + [x], axis=1)

        pos_embed = self.param("pos_embed", trunc_init, (1, cfg.seq_len, C), jnp.float32)
        x = x + pos_embed.astype(self.dtype)
        if cfg.drop_rate > 0 and train:
            x = nn.Dropout(cfg.drop_rate, deterministic=False)(x)

        # Shared projections to teacher width (de_vit.py:198-201).
        resize_att = resize_enc = resize_tok = None
        if cfg.resize_dim is not None:
            resize_tok = nn.Dense(cfg.resize_dim, dtype=self.dtype,
                                  kernel_init=trunc_init, name="resize_mlp")
            resize_att = nn.Dense(cfg.resize_dim, dtype=self.dtype,
                                  kernel_init=trunc_init, name="resize_att_mlp")
            resize_enc = nn.Dense(cfg.resize_dim, dtype=self.dtype,
                                  kernel_init=trunc_init, name="resize_encoder_mlp")
            if self.is_initializing():
                # Materialise resize params regardless of which capture flags
                # the init call used, so any apply-time flag combination works.
                dummy = jnp.zeros((1, C), self.dtype)
                resize_tok(dummy), resize_att(dummy), resize_enc(dummy)

        embedding = None
        if capture_embedding:
            embedding = resize_enc(x) if resize_enc is not None else x

        dp_rates = jnp.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        layer_ids = jnp.arange(cfg.depth)
        qkv_slot = jnp.zeros((3, B, cfg.num_heads, cfg.seq_len, cfg.head_dim), self.dtype)

        # fast_math is an INFERENCE mode: if this instance is driven with
        # train=True anyway (e.g. a serving-configured model reused for
        # fine-tuning), the pinned training numerics must hold — f32 LN
        # statistics and erf GELU (the reference's AMP policy also kept
        # softmax/LN fp32; CLAUDE.md pins the tanh lowering to serving only)
        fast_math = self.fast_math and not train
        stat_dtype = self.dtype if fast_math else jnp.float32
        if self.use_remat and train:
            # whitelist: jax.checkpoint_policies also exports FACTORIES
            # (save_only_these_names, ...) which, passed bare, are truthy for
            # every primitive — remat silently disables and the bs256 step
            # reinflates to ~21 GB. Only plain policies are accepted here.
            plain = {"dots_saveable", "dots_with_no_batch_dims_saveable",
                     "checkpoint_dots", "checkpoint_dots_with_no_batch_dims",
                     "everything_saveable", "nothing_saveable"}
            if self.remat_policy is None:
                policy = None
            elif self.remat_policy == "dots_and_attn":
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_saveable,
                    jax.checkpoint_policies.save_only_these_names("attn_out"),
                )
            elif self.remat_policy in plain:
                policy = getattr(jax.checkpoint_policies, self.remat_policy)
            else:
                raise ValueError(
                    f"remat_policy={self.remat_policy!r} is not a supported "
                    f"checkpoint policy; choose from {sorted(plain)} or "
                    "'dots_and_attn'")
            BlockImpl = nn.remat(Block, prevent_cse=False, policy=policy)
        else:
            BlockImpl = Block
        ScanBlocks = nn.scan(
            BlockImpl,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=0,
            out_axes=0,
            length=cfg.depth,
        )
        (x, qkv_slot), layer_outs = ScanBlocks(
            cfg=cfg,
            deterministic=not train,
            capture_qkv=capture_qkv,
            capture_layer=capture_layer,
            capture_block_outputs=capture_block_outputs,
            capture_rank_stats=capture_rank_stats,
            dtype=self.dtype,
            softmax_dtype=jnp.float32,  # kernel parity — see Block attr note
            norm_dtype=stat_dtype,
            use_pallas=self.use_pallas,
            fast_math=fast_math,
            name="blocks",
        )((x, qkv_slot), (gates.head, gates.neuron, dp_rates, layer_ids))

        x = LayerNorm(eps=cfg.layer_norm_eps, stat_dtype=stat_dtype, name="norm")(x)

        cls_feat = x[:, 0]
        dist_feat = x[:, 1] if cfg.distilled else None

        if cfg.representation_size is not None and not cfg.distilled:
            cls_feat = nn.Dense(cfg.representation_size, dtype=self.dtype,
                                kernel_init=nn.initializers.lecun_normal(),
                                name="pre_logits")(cls_feat)
            cls_feat = jnp.tanh(cls_feat)

        qkv = None
        if capture_qkv == "all":
            qkv = layer_outs.get("qkv")
        elif capture_qkv == "middle":
            qkv = qkv_slot

        attn = encoders = None
        if capture_block_outputs:
            attn = layer_outs["attn"]
            encoders = layer_outs["encoder"]
            if resize_att is not None:
                attn = resize_att(attn)
                encoders = resize_enc(encoders)

        last_tokens = None
        if distill_token:
            if cfg.distilled:
                lt_cls, lt_dist = cls_feat, dist_feat
                if resize_tok is not None:
                    lt_cls, lt_dist = resize_tok(lt_cls), resize_tok(lt_dist)
                last_tokens = (lt_cls, lt_dist)
            else:
                last_tokens = resize_tok(cls_feat) if resize_tok is not None else cls_feat

        if features_only:
            return ViTOutput(
                logits=cls_feat, cls_feat=cls_feat, dist_feat=dist_feat,
                last_tokens=last_tokens, qkv=qkv, attn=attn, encoders=encoders,
                embedding=embedding,
                neuron_act=layer_outs.get("neuron_act"),
                head_out=layer_outs.get("head_out"),
            )

        num_classes = cfg.num_classes
        head = nn.Dense(num_classes, dtype=self.dtype, kernel_init=trunc_init, name="head")
        cls_logits = head(cls_feat).astype(jnp.float32)
        dist_logits = None
        if cfg.distilled:
            head_dist = nn.Dense(num_classes, dtype=self.dtype,
                                 kernel_init=trunc_init, name="head_dist")
            dist_logits = head_dist(dist_feat).astype(jnp.float32)
            logits = (cls_logits + dist_logits) / 2.0  # eval fusion (de_vit.py:318)
        else:
            logits = cls_logits

        return ViTOutput(
            logits=logits, cls_logits=cls_logits, dist_logits=dist_logits,
            cls_feat=cls_feat, dist_feat=dist_feat, last_tokens=last_tokens,
            qkv=qkv, attn=attn, encoders=encoders, embedding=embedding,
            neuron_act=layer_outs.get("neuron_act"),
            head_out=layer_outs.get("head_out"),
        )


def create_vit(name: str, **overrides) -> VisionTransformer:
    dtype = overrides.pop("dtype", jnp.bfloat16)
    fast_math = overrides.pop("fast_math", False)
    use_pallas = overrides.pop("use_pallas", False)
    use_remat = overrides.pop("use_remat", True)
    remat_policy = overrides.pop("remat_policy", None)
    return VisionTransformer(get_vit_config(name, **overrides), dtype=dtype,
                             fast_math=fast_math, use_pallas=use_pallas,
                             use_remat=use_remat, remat_policy=remat_policy)
