"""Compact Convolutional Transformer — the third backbone family.

Parity surface: reference `models/cct.py` (CCT wrapper :38-178, registry
:226-470, `get_decct` :461-470), `models/utils/tokenizer.py` (conv tokenizer
:6-49), `models/utils/transformers.py` (pre-norm encoder layers :73-113 with
bias-free qkv, seq-pool attention pooling :348-353, learnable/sinusoidal
positional embeddings :294-303, headless CCTTransformer :386-477).

Differences from the ViT in models/vit.py worth pinning: qkv has NO bias, the
positional embedding init is trunc_normal std 0.2 (not 0.02), LayerNorm eps is
torch default 1e-5, and pooling is seq-pool (softmax-weighted token average)
instead of a CLS token.

Head/neuron gates are supported exactly like the ViT (a capability superset —
the reference never gates CCT), so the shrink/DEKD stages work on CCT too.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from devit_tpu.configs import CCTConfig, get_cct_config
from devit_tpu.models.vit import (
    Gates, LayerNorm, drop_path, fast_gelu, trunc_init,
)

Array = jax.Array


class CCTOutput(NamedTuple):
    logits: Optional[Array]
    pooled: Array  # seq-pool feature (B, D) — the MultiCCT ensemble token
    attn: Optional[Array] = None  # (L, B, N, D or resize_dim) per-layer attention outputs
    hidden: Optional[Array] = None  # (L+1, B, N, D or resize_dim) hidden states
    qkv: Optional[Array] = None  # (3,B,H,N,dh) middle-layer capture for DEKD
    neuron_act: Optional[Array] = None  # (L,B,N,hidden) post-GELU pre-gate
    head_out: Optional[Array] = None  # (L,B,N,H,dh) pre-gate head outputs

    # API compatibility with ViTOutput so the DEKD/stage-2 steps work on CCT
    # students/teachers unchanged (CCT has a single head; no dist logits).
    @property
    def cls_logits(self):
        return self.logits

    @property
    def dist_logits(self):
        return None

    @property
    def last_tokens(self):
        return self.pooled


def sinusoidal_embedding(n: int, dim: int) -> np.ndarray:
    """transformers.py:380-385 exact formula."""
    pe = np.array(
        [[p / (10000 ** (2 * (i // 2) / dim)) for i in range(dim)] for p in range(n)],
        dtype=np.float32,
    )
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return pe[None]


class Tokenizer(nn.Module):
    """Conv tokenizer (tokenizer.py:6-49): n stages of conv(k,s,p,bias=False)
    -> ReLU -> maxpool(3,2,1); flatten to a token sequence."""

    cfg: CCTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        in_planes = 64
        widths = [in_planes] * (cfg.n_conv_layers - 1) + [cfg.embed_dim]
        x = x.astype(self.dtype)
        for i, w in enumerate(widths):
            x = nn.Conv(
                w, (cfg.kernel_size, cfg.kernel_size),
                strides=(cfg.conv_stride, cfg.conv_stride),
                padding=cfg.conv_padding, use_bias=False,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            x = nn.max_pool(
                x, (cfg.pooling_kernel_size,) * 2,
                strides=(cfg.pooling_stride,) * 2,
                padding=((cfg.pooling_padding,) * 2,) * 2,
            )
        B, H, W, D = x.shape
        return x.reshape(B, H * W, D)


class CCTLayer(nn.Module):
    """Pre-norm encoder layer (transformers.py:73-113); used under nn.scan."""

    cfg: CCTConfig
    deterministic: bool = True
    capture_qkv: str = "none"
    capture_layer: int = -1
    capture_outputs: bool = False
    capture_rank_stats: bool = False  # neuron_act/head_out for HSIC ranking
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, per_layer):
        cfg = self.cfg
        x, qkv_slot = carry
        head_gate, neuron_gate, dp_rate, layer_idx = per_layer
        B, N, D = x.shape
        H = cfg.num_heads
        dh = D // H
        hidden = int(D * cfg.mlp_ratio)

        h = LayerNorm(eps=1e-5, name="pre_norm")(x)
        qkv = nn.Dense(3 * D, use_bias=False, dtype=self.dtype,
                       kernel_init=trunc_init, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, H, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (dh ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if cfg.attention_dropout > 0 and not self.deterministic:
            probs = nn.Dropout(cfg.attention_dropout, deterministic=False)(probs)
        att = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        # PRE-gate head outputs, (B,N,H,dh) — the HSIC ranking statistic
        # (imp_rank.py:108; same capture point as vit.Block)
        head_out = att.transpose(0, 2, 1, 3) if self.capture_rank_stats else None
        att = att * head_gate.astype(self.dtype)[None, :, None, None]
        att = att.transpose(0, 2, 1, 3).reshape(B, N, D)
        att = nn.Dense(D, dtype=self.dtype, kernel_init=trunc_init, name="proj")(att)
        if cfg.dropout > 0 and not self.deterministic:
            att = nn.Dropout(cfg.dropout, deterministic=False)(att)

        x = x + self._drop_path(att, dp_rate)
        h = LayerNorm(eps=1e-5, name="norm1")(x)
        h = nn.Dense(hidden, dtype=self.dtype, kernel_init=trunc_init, name="linear1")(h)
        h = fast_gelu(h)  # exact-erf GELU, fast lowering (vit.fast_erf)
        if cfg.dropout > 0 and not self.deterministic:
            h = nn.Dropout(cfg.dropout, deterministic=False)(h)
        neuron_act = h if self.capture_rank_stats else None  # pre-gate
        h = h * neuron_gate.astype(self.dtype)[None, None, :]
        h = nn.Dense(D, dtype=self.dtype, kernel_init=trunc_init, name="linear2")(h)
        if cfg.dropout > 0 and not self.deterministic:
            h = nn.Dropout(cfg.dropout, deterministic=False)(h)
        x = x + self._drop_path(h, dp_rate)

        outs = {}
        if self.capture_qkv == "all":
            outs["qkv"] = jnp.stack([q, k, v])
        elif self.capture_qkv == "middle":
            hit = layer_idx == self.capture_layer
            qkv_slot = jnp.where(hit, jnp.stack([q, k, v]).astype(qkv_slot.dtype), qkv_slot)
        if self.capture_outputs:
            outs["attn"] = att
            outs["hidden"] = x
        if self.capture_rank_stats:
            outs["neuron_act"] = neuron_act
            outs["head_out"] = head_out
        return (x, qkv_slot), outs

    def _drop_path(self, x: Array, rate: Array) -> Array:
        if self.deterministic:
            return x
        return drop_path(x, rate, self.make_rng("dropout"))


class CCT(nn.Module):
    """Full CCT: tokenizer + transformer + seq-pool (+ classifier unless
    backbone). `backbone=True` mirrors CCTTransformer: returns the pooled
    feature for the MultiCCT ensemble (cct.py:102-116)."""

    cfg: CCTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: Array,
        gates: Optional[Gates] = None,
        *,
        train: bool = False,
        capture_qkv: str = "none",
        capture_layer: Optional[int] = None,
        capture_outputs: bool = False,
        capture_rank_stats: bool = False,
        distill_token: bool = False,  # accepted for step-API parity; the
        # pooled feature doubles as the distillation token (CCTOutput.last_tokens)
    ) -> CCTOutput:
        cfg = self.cfg
        x = Tokenizer(cfg, dtype=self.dtype, name="tokenizer")(x)
        B, N, D = x.shape
        L = cfg.num_layers
        H = cfg.num_heads
        hidden = int(D * cfg.mlp_ratio)
        if capture_layer is None:
            # mod L: a 1-layer CCT must capture its only layer (the reference
            # indexes a Python list, where //2-1 == -1 wraps to the last
            # layer); a bare -1 never matches layer_idx -> silent zeros
            capture_layer = (L // 2 - 1) % L

        if not cfg.seq_pool:
            cls = self.param("class_emb", nn.initializers.zeros, (1, 1, D), jnp.float32)
            x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (B, 1, D)), x], 1)
            N += 1

        if cfg.positional_embedding == "learnable":
            from devit_tpu.models.vit import _torch_trunc_normal

            pe = self.param("positional_emb", _torch_trunc_normal(0.2),
                            (1, N, D), jnp.float32)
            x = x + pe.astype(self.dtype)
        elif cfg.positional_embedding == "sine":
            x = x + jnp.asarray(sinusoidal_embedding(N, D), self.dtype)
        elif cfg.positional_embedding != "none":
            # the reference coerces unknown values to 'sine'
            # (transformers.py:159-160); a typo must not silently build a
            # PE-free model
            raise ValueError(
                f"positional_embedding={cfg.positional_embedding!r} "
                "(expected 'learnable', 'sine', or 'none')")

        if cfg.dropout > 0 and train:
            x = nn.Dropout(cfg.dropout, deterministic=False)(x)

        if gates is None:
            gates = Gates(head=jnp.ones((L, H)), neuron=jnp.ones((L, hidden)))

        dp_rates = jnp.linspace(0.0, cfg.stochastic_depth, L)
        layer_ids = jnp.arange(L)
        qkv_slot = jnp.zeros((3, B, H, N, D // H), self.dtype)

        ScanLayers = nn.scan(
            CCTLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=0, out_axes=0, length=L,
        )
        x_emb = x  # post-PE, post-dropout embedding = reference hidden[0]
        (x, qkv_slot), layer_outs = ScanLayers(
            cfg=cfg, deterministic=not train, capture_qkv=capture_qkv,
            capture_layer=capture_layer, capture_outputs=capture_outputs,
            capture_rank_stats=capture_rank_stats,
            dtype=self.dtype, name="blocks",
        )((x, qkv_slot), (gates.head, gates.neuron, dp_rates, layer_ids))

        x = LayerNorm(eps=1e-5, name="norm")(x)

        if cfg.seq_pool:
            # softmax(attention_pool(x))^T @ x (transformers.py:348-353)
            w = nn.Dense(1, dtype=self.dtype, kernel_init=trunc_init,
                         name="attention_pool")(x)
            w = jax.nn.softmax(w.astype(jnp.float32), axis=1).astype(self.dtype)
            pooled = jnp.einsum("bn1,bnd->bd", w, x)
        else:
            pooled = x[:, 0]

        resize = None
        if cfg.resize_dim is not None:
            resize = nn.Dense(cfg.resize_dim, dtype=self.dtype,
                              kernel_init=trunc_init, name="resize")
            if self.is_initializing():
                # materialise the resize params regardless of which capture
                # flags the INIT call used, so any apply-time flag combination
                # works (same guard as vit.py's resize heads — without it,
                # init with capture_outputs=False then apply with
                # capture_outputs=True dies with ScopeParamNotFoundError)
                resize(jnp.zeros((1, cfg.embed_dim), self.dtype))

        attn = hidden_states = None
        if capture_outputs:
            attn = layer_outs["attn"]
            # (L+1, ...): the reference seeds hidden states with the post-PE
            # embedding before the per-block appends (transformers.py:214)
            hidden_states = jnp.concatenate([x_emb[None], layer_outs["hidden"]])
            if resize is not None:
                attn, hidden_states = resize(attn), resize(hidden_states)

        qkv = layer_outs.get("qkv") if capture_qkv == "all" else (
            qkv_slot if capture_qkv == "middle" else None
        )

        neuron_act = layer_outs.get("neuron_act") if capture_rank_stats else None
        head_out = layer_outs.get("head_out") if capture_rank_stats else None

        if cfg.backbone:
            return CCTOutput(logits=None, pooled=pooled, attn=attn,
                             hidden=hidden_states, qkv=qkv,
                             neuron_act=neuron_act, head_out=head_out)

        logits = nn.Dense(cfg.num_classes, dtype=self.dtype,
                          kernel_init=trunc_init, name="fc")(pooled)
        return CCTOutput(logits=logits.astype(jnp.float32), pooled=pooled,
                         attn=attn, hidden=hidden_states, qkv=qkv,
                         neuron_act=neuron_act, head_out=head_out)


def create_cct(name: str, **overrides) -> CCT:
    """Registry factory ('cct_7_3x1_32', 'decct_7_3x1' etc.; cct.py:226-470).
    'decct_*' = decomposed CCT backbone (get_decct, cct.py:461-470)."""
    dtype = overrides.pop("dtype", jnp.bfloat16)
    if name.startswith("decct"):
        overrides.setdefault("backbone", True)
        name = name.replace("decct", "cct", 1)
    return CCT(get_cct_config(name, **overrides), dtype=dtype)
