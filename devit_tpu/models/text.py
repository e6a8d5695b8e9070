"""Text/NLP model stack — the reference's masked-attention CCT variant.

Parity surface: reference `models/utils/embedder.py` (Embedder :1-37),
`models/utils/tokenizer.py` (TextTokenizer :52-109 — 1-D conv over word
embeddings with window-propagated masks), `models/utils/transformers.py`
(MaskedAttention :38-70, MaskedTransformerEncoderLayer :117-142,
MaskedTransformerClassifier :509-615). All of it is dormant in the reference
(no entry script imports it — SURVEY.md §2.6 dead code), ported so the
library surface is complete; exact parity is pinned in tests/test_text.py
against the reference's own modules.

RESOLVED REFERENCE BUG (pinned by test_text.py): MaskedTransformerClassifier
crashes as committed for positional_embedding in {'sine', 'learnable'} — the
"padding idx" bookkeeping (transformers.py:544-553) makes the stored PE one
row LONGER than the input (`x += self.positional_emb` raises a size-mismatch
RuntimeError), so only 'none' ever ran. The intended semantics (row 0 of the
PE is a reserved padding row; sequence position p reads row p+1, which for
the sinusoidal table is exactly the plain position-p sinusoid) is what we
implement: the stored table keeps the reference's (1, N+1, E) shape for
checkpoint compatibility and the forward adds `pe[:, 1 : 1+N]`.

Exact reference quirk kept: MaskedTransformerEncoderLayer's MLP residual adds
onto the NORMALIZED attention output (`src = norm1(src); src = src + mlp(src)`
— transformers.py:137-142), unlike the unmasked layer whose residual base is
the pre-norm value. Parity-pinned.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from devit_tpu.models.cct import sinusoidal_embedding
from devit_tpu.models.vit import (
    LayerNorm, _torch_trunc_normal, drop_path, fast_gelu, trunc_init,
)

Array = jax.Array


def conv_seq_len(n: int, kernel: int, stride: int, padding: int) -> int:
    return (n + 2 * padding - kernel) // stride + 1


class Embedder(nn.Module):
    """Word-embedding lookup (embedder.py:4-28): torch nn.Embedding with a
    zeroed `padding_idx` row; masked positions are multiplied out."""

    vocab_size: int
    embedding_dim: int
    padding_idx: Optional[int] = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, ids: Array, mask: Optional[Array] = None):
        pad = self.padding_idx

        def init(key, shape, dtype):
            # torch nn.Embedding default init N(0,1) with the padding row
            # zeroed (the reference never overrides it)
            e = jax.random.normal(key, shape, dtype)
            return e.at[pad].set(0.0) if pad is not None else e

        table = self.param("embedding", init,
                           (self.vocab_size, self.embedding_dim), jnp.float32)
        x = jnp.take(table.astype(self.dtype), ids, axis=0)
        if mask is not None:
            x = x * (mask > 0).astype(self.dtype)[..., None]
        return x, mask


class TextTokenizer(nn.Module):
    """1-D conv tokenizer over word embeddings (tokenizer.py:52-109): conv of
    kernel (k, E) stride (s, 1) pad (p, 0) with no bias, optional activation,
    optional maxpool (pk, 1)/(ps, 1)/pad (pp, 0). The mask is propagated
    through the same windows (forward_mask: any surviving input position
    keeps the output position alive)."""

    n_output_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 1
    pooling_kernel_size: int = 3
    pooling_stride: int = 2
    pooling_padding: int = 1
    use_activation: bool = False  # reference default activation=None
    max_pool: bool = True
    dtype: Any = jnp.bfloat16

    def seq_len(self, n: int) -> int:
        """Closed-form output length (reference probes with a zeros forward,
        tokenizer.py:78-79)."""
        out = conv_seq_len(n, self.kernel_size, self.stride, self.padding)
        if self.max_pool:
            out = conv_seq_len(out, self.pooling_kernel_size,
                               self.pooling_stride, self.pooling_padding)
        return out

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None):
        B, L, E = x.shape
        # torch Conv2d(1, C, (k, E), stride (s, 1), pad (p, 0)) over the
        # (L, E) plane == flax Conv over (B, L, E, 1) with the E axis fully
        # contracted by the kernel
        h = nn.Conv(
            self.n_output_channels, (self.kernel_size, E),
            strides=(self.stride, 1),
            padding=((self.padding, self.padding), (0, 0)),
            use_bias=False, kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype, name="conv",
        )(x.astype(self.dtype)[..., None])  # (B, L', 1, C)
        if self.use_activation:
            h = nn.relu(h)
        if self.max_pool:
            h = nn.max_pool(
                h, (self.pooling_kernel_size, 1),
                strides=(self.pooling_stride, 1),
                padding=((self.pooling_padding, self.pooling_padding), (0, 0)),
            )
        h = h.squeeze(2)  # (B, L'', C)
        if mask is not None:
            h = h * self.forward_mask(mask).astype(self.dtype)[..., None]
        return h, mask

    def forward_mask(self, mask: Array) -> Array:
        """tokenizer.py:81-97: boolean window propagation — conv1d with a
        ones kernel (zero padding) then maxpool1d (identity padding), > 0."""
        m = (mask > 0).astype(jnp.float32)[:, :, None]  # (B, L, 1)
        m = jax.lax.reduce_window(
            m, 0.0, jax.lax.add,
            window_dimensions=(1, self.kernel_size, 1),
            window_strides=(1, self.stride, 1),
            padding=((0, 0), (self.padding, self.padding), (0, 0)),
        )
        if self.max_pool:
            m = jax.lax.reduce_window(
                m, -jnp.inf, jax.lax.max,
                window_dimensions=(1, self.pooling_kernel_size, 1),
                window_strides=(1, self.pooling_stride, 1),
                padding=((0, 0),
                         (self.pooling_padding, self.pooling_padding),
                         (0, 0)),
            )
        return m[:, :, 0] > 0


class MaskedTextLayer(nn.Module):
    """MaskedTransformerEncoderLayer (transformers.py:117-142), used under
    nn.scan. Masked attention: the (B, N) key-validity mask is expanded to a
    pairwise (query, key) mask and invalid logits are filled with the dtype
    minimum BEFORE softmax (MaskedAttention, transformers.py:56-62) — a fully
    masked query row therefore softmaxes to uniform, exactly like torch."""

    embedding_dim: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    deterministic: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, carry, per_layer):
        x, mask = carry
        (dp_rate,) = per_layer
        B, N, D = x.shape
        H = self.num_heads
        dh = D // H

        h = LayerNorm(eps=1e-5, name="pre_norm")(x)
        qkv = nn.Dense(3 * D, use_bias=False, dtype=self.dtype,
                       kernel_init=trunc_init, name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, H, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (dh ** -0.5)
        if mask is not None:
            pair = (mask[:, None, :, None] & mask[:, None, None, :])  # (B,1,N,N)
            logits = jnp.where(pair, logits, jnp.finfo(logits.dtype).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        if self.attention_dropout > 0 and not self.deterministic:
            probs = nn.Dropout(self.attention_dropout, deterministic=False)(probs)
        att = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        att = att.transpose(0, 2, 1, 3).reshape(B, N, D)
        att = nn.Dense(D, dtype=self.dtype, kernel_init=trunc_init, name="proj")(att)
        if self.dropout > 0 and not self.deterministic:
            att = nn.Dropout(self.dropout, deterministic=False)(att)

        x = x + self._drop_path(att, dp_rate)
        # the reference quirk: norm1 output REPLACES the residual stream
        # (transformers.py:139), so the MLP residual adds onto normed values
        x = LayerNorm(eps=1e-5, name="norm1")(x)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype,
                     kernel_init=trunc_init, name="linear1")(x)
        h = fast_gelu(h)
        if self.dropout > 0 and not self.deterministic:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        h = nn.Dense(D, dtype=self.dtype, kernel_init=trunc_init, name="linear2")(h)
        if self.dropout > 0 and not self.deterministic:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        x = x + self._drop_path(h, dp_rate)
        return (x, mask), {}

    def _drop_path(self, x: Array, rate: Array) -> Array:
        if self.deterministic:
            return x
        return drop_path(x, rate, self.make_rng("dropout"))


class MaskedTextClassifier(nn.Module):
    """MaskedTransformerClassifier (transformers.py:509-615): optional class
    token (seq_pool=False) or softmax seq-pool, padding-row positional
    embedding (see module docstring for the resolved off-by-one), masked
    encoder stack, linear head."""

    seq_len: int
    num_classes: int
    embedding_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    attention_dropout: float = 0.1
    stochastic_depth: float = 0.1
    positional_embedding: str = "sine"  # 'sine' | 'learnable' | 'none'
    seq_pool: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None, *,
                 train: bool = False) -> Array:
        B, N, D = x.shape
        # the reference builds its PE tables from the constructor seq_len
        # (transformers.py:531-552); we build from the runtime N, so a
        # mismatched seq_len must fail loudly instead of silently shaping a
        # different learnable PE than the declared geometry
        if self.positional_embedding != "none" and N != self.seq_len:
            raise ValueError(
                f"input sequence length {N} != declared seq_len "
                f"{self.seq_len} (positional_embedding="
                f"{self.positional_embedding!r} sizes its table from it)")
        if mask is not None:
            mask = mask > 0

        if not self.seq_pool:
            cls = self.param("class_emb", nn.initializers.zeros, (1, 1, D),
                             jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, D)), x], 1)
            N += 1
            if mask is not None:
                # the class token is always valid (transformers.py:583-585)
                mask = jnp.concatenate(
                    [jnp.ones((B, 1), bool), mask], axis=1)

        if self.positional_embedding == "learnable":
            # reference shape kept: (1, N+1, E) with row 0 = padding row
            pe = self.param("positional_emb", _torch_trunc_normal(0.2),
                            (1, N + 1, D), jnp.float32)
            x = x + pe[:, 1 : 1 + N].astype(self.dtype)
        elif self.positional_embedding == "sine":
            # row p+1 of the padding-prefixed table == plain sinusoid row p
            x = x + jnp.asarray(sinusoidal_embedding(N, D), self.dtype)
        elif self.positional_embedding != "none":
            raise ValueError(
                f"positional_embedding={self.positional_embedding!r} "
                "(expected 'learnable', 'sine', or 'none')")

        if self.dropout > 0 and train:
            x = nn.Dropout(self.dropout, deterministic=False)(x)

        L = self.num_layers
        dp_rates = jnp.linspace(0.0, self.stochastic_depth, L)
        ScanLayers = nn.scan(
            MaskedTextLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=0, out_axes=0, length=L,
        )
        (x, _), _ = ScanLayers(
            embedding_dim=D, num_heads=self.num_heads,
            dim_feedforward=int(D * self.mlp_ratio),
            dropout=self.dropout, attention_dropout=self.attention_dropout,
            deterministic=not train, dtype=self.dtype, name="blocks",
        )((x, mask), (dp_rates,))

        x = LayerNorm(eps=1e-5, name="norm")(x)
        if self.seq_pool:
            w = nn.Dense(1, dtype=self.dtype, kernel_init=trunc_init,
                         name="attention_pool")(x)
            w = jax.nn.softmax(w.astype(jnp.float32), axis=1).astype(self.dtype)
            pooled = jnp.einsum("bn1,bnd->bd", w, x)
        else:
            pooled = x[:, 0]

        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          kernel_init=trunc_init, name="fc")(pooled)
        return logits.astype(jnp.float32)


class TextCCT(nn.Module):
    """Embedder -> TextTokenizer -> MaskedTextClassifier composition (the
    upstream Compact-Transformers `text_cct` wiring the reference vendored
    these modules from; the reference itself ships no text factory)."""

    vocab_size: int
    num_classes: int
    word_seq_len: int = 64
    word_embedding_dim: int = 300
    embedding_dim: int = 256
    kernel_size: int = 4
    num_layers: int = 4
    num_heads: int = 4
    mlp_ratio: float = 2.0
    padding_idx: Optional[int] = 1
    positional_embedding: str = "sine"
    dropout: float = 0.1
    attention_dropout: float = 0.1
    stochastic_depth: float = 0.1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, ids: Array, mask: Optional[Array] = None, *,
                 train: bool = False) -> Array:
        x, mask = Embedder(self.vocab_size, self.word_embedding_dim,
                           padding_idx=self.padding_idx, dtype=self.dtype,
                           name="embedder")(ids, mask)
        tok = TextTokenizer(
            n_output_channels=self.embedding_dim,
            kernel_size=self.kernel_size, stride=2,
            padding=1, pooling_kernel_size=3, pooling_stride=2,
            pooling_padding=1, max_pool=True, dtype=self.dtype,
            name="tokenizer")
        x, _ = tok(x, mask)
        out_mask = tok.forward_mask(mask) if mask is not None else None
        return MaskedTextClassifier(
            seq_len=tok.seq_len(self.word_seq_len),
            num_classes=self.num_classes,
            embedding_dim=self.embedding_dim, num_layers=self.num_layers,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            dropout=self.dropout, attention_dropout=self.attention_dropout,
            stochastic_depth=self.stochastic_depth,
            positional_embedding=self.positional_embedding,
            seq_pool=True, dtype=self.dtype, name="classifier",
        )(x, out_mask, train=train)
