"""Collaborative-inference ensemble: division-stacked backbones + token fusion.

Parity surface: reference `models/ensemble_models.py` — `MultiViT` (:13-40) runs
N sub-models on the same batch and returns their CLS/dist tokens; `EnsMLP`
(:43-90) concatenates the tokens, optionally projects to the teacher width, and
classifies over the full label set; `MultiCCT`/`EnsembleCCT` (:93-151) are the
CCT analogues.

TPU-native restructuring: the reference loops over an nn.ModuleList
sequentially on one device (ensemble_models.py:33). Here the N divisions live
as ONE parameter pytree with a leading division axis and the forward is a
single `jax.vmap` — one batched XLA program. On a mesh with a 'div' axis the
stacked params shard across sub-meshes and the token concat in EnsMLP becomes
an ICI all-gather inserted by XLA SPMD (SURVEY.md §2.7).

Per-division class counts may differ (`--sub_classes`, ensemble.py:160); heads
are deleted in the reference (ensemble.py:28-30) and never materialised here —
MultiViT calls the backbone with `features_only=True`, so unequal head widths
never enter the stacked pytree.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from devit_tpu.models.vit import Gates, VisionTransformer, full_gates, trunc_init

Array = jax.Array


def stack_division_params(variables_list: Sequence[Any]):
    """Stack per-division variable pytrees into one pytree with leading D axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *variables_list)


def stack_division_gates(gates_list: Sequence[Gates]) -> Gates:
    return Gates(
        head=jnp.stack([g.head for g in gates_list]),
        neuron=jnp.stack([g.neuron for g in gates_list]),
    )


def init_multivit(model: VisionTransformer, rng, sample: Array, num_divisions: int):
    """Initialise N divisions with independent RNG streams -> stacked variables."""
    keys = jax.random.split(rng, num_divisions)
    return jax.vmap(lambda k: model.init(k, sample, features_only=True))(keys)


def multivit_features(
    model: VisionTransformer,
    stacked_variables,
    x: Array,
    stacked_gates: Optional[Gates] = None,
    *,
    train: bool = False,
    rng=None,
) -> Tuple[Array, Optional[Array]]:
    """All-division forward on the same batch (ensemble_models.py:32-40).

    train=True enables dropout/stochastic depth in the backbones (the
    reference trains stage 5 with model.train(True), engine.py:146, and
    MultiViT builds its backbones with drop_path=args.drop_path,
    ensemble_models.py:14) — each division gets an independent rng stream.

    Returns (cls_tokens (D,B,C), dist_tokens (D,B,C) or None).
    """
    D = jax.tree_util.tree_leaves(stacked_variables)[0].shape[0]
    if stacked_gates is None:
        g = full_gates(model.cfg)
        stacked_gates = Gates(
            head=jnp.broadcast_to(g.head, (D, *g.head.shape)),
            neuron=jnp.broadcast_to(g.neuron, (D, *g.neuron.shape)),
        )

    if train:
        if rng is None:
            raise ValueError(
                "multivit_features(train=True) needs rng= for the backbones' "
                "dropout/drop-path streams")

        def one_train(variables, gates, key):
            out = model.apply(variables, x, gates=gates, features_only=True,
                              train=True, rngs={"dropout": key})
            return out.cls_feat, out.dist_feat

        keys = jax.random.split(rng, D)
        cls_t, dist_t = jax.vmap(one_train)(stacked_variables, stacked_gates, keys)
        return cls_t, dist_t

    def one(variables, gates):
        out = model.apply(variables, x, gates=gates, features_only=True)
        return out.cls_feat, out.dist_feat

    cls_t, dist_t = jax.vmap(one)(stacked_variables, stacked_gates)
    return cls_t, dist_t


class EnsOutput(NamedTuple):
    logits: Array
    cls_logits: Optional[Array] = None
    dist_logits: Optional[Array] = None
    ens_tokens: Optional[Any] = None  # fused token(s) for EnsLoss token matching


class EnsMLP(nn.Module):
    """Token-fusion head over division tokens (ensemble_models.py:43-90).

    Division tokens (D, B, C) are concatenated division-major per batch element,
    optionally projected to `teacher_size`, then classified over the full label
    set; the deit family averages separate cls/dist classifiers.
    """

    num_classes: int = 100
    sub_size: int = 384
    num_divisions: int = 4
    teacher_size: Optional[int] = None
    family: str = "deit"  # 'deit' (dual tokens) | 'vit' (cls only)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        cls_tokens: Array,
        dist_tokens: Optional[Array] = None,
        *,
        distill: bool = False,
        train: bool = False,
    ) -> EnsOutput:
        def fuse(tokens: Array) -> Array:
            # (D, B, C) -> (B, D*C), division-major (torch.stack(x,1).view(B,-1))
            D, B, C = tokens.shape
            return tokens.transpose(1, 0, 2).reshape(B, D * C).astype(self.dtype)

        ens_cls = fuse(cls_tokens)
        if self.teacher_size is not None:
            ens_cls = nn.Dense(self.teacher_size, dtype=self.dtype,
                               kernel_init=trunc_init, name="cls_mlp")(ens_cls)
        cls_logits = nn.Dense(self.num_classes, dtype=self.dtype,
                              kernel_init=trunc_init, name="cls_classifier")(ens_cls)
        cls_logits = cls_logits.astype(jnp.float32)

        if "deit" in self.family:
            assert dist_tokens is not None, "deit family needs dist tokens"
            ens_dist = fuse(dist_tokens)
            if self.teacher_size is not None:
                ens_dist = nn.Dense(self.teacher_size, dtype=self.dtype,
                                    kernel_init=trunc_init, name="dist_mlp")(ens_dist)
            dist_logits = nn.Dense(self.num_classes, dtype=self.dtype,
                                   kernel_init=trunc_init, name="dist_classifier")(ens_dist)
            dist_logits = dist_logits.astype(jnp.float32)
            logits = (cls_logits + dist_logits) / 2.0
            ens_tokens = (ens_cls, ens_dist)
        else:
            logits = cls_logits
            dist_logits = None
            ens_tokens = ens_cls

        want_tokens = distill and train and self.teacher_size is not None
        return EnsOutput(
            logits=logits,
            cls_logits=cls_logits,
            dist_logits=dist_logits,
            ens_tokens=ens_tokens if want_tokens else None,
        )


def multicct_features(cct_model, stacked_variables, x: Array,
                      stacked_gates: Optional[Gates] = None, *,
                      train: bool = False, rng=None) -> Array:
    """All-division CCT backbone forward -> pooled features (D, B, C)
    (MultiCCT, ensemble_models.py:93-113). train=True enables the backbones'
    dropout/stochastic depth (engine.py:146 model.train(True)), one rng
    stream per division. stacked_gates ((D,L,H)/(D,L,hidden)) applies each
    division's shrink gates — the CCT family keeps the same resolved
    reference bug fix as MultiViT (the reference's ensemble silently drops
    the distill-stage gates)."""
    D = jax.tree_util.tree_leaves(stacked_variables)[0].shape[0]
    if stacked_gates is None:
        cfg = cct_model.cfg
        stacked_gates = Gates(
            head=jnp.ones((D, cfg.num_layers, cfg.num_heads)),
            neuron=jnp.ones((D, cfg.num_layers,
                             int(cfg.embed_dim * cfg.mlp_ratio))),
        )
    if train:
        if rng is None:
            raise ValueError(
                "multicct_features(train=True) needs rng= for the backbones' "
                "dropout/drop-path streams")

        def one_train(variables, gates, key):
            return cct_model.apply(variables, x, gates=gates, train=True,
                                   rngs={"dropout": key}).pooled

        return jax.vmap(one_train)(stacked_variables, stacked_gates,
                                   jax.random.split(rng, D))

    def one(variables, gates):
        return cct_model.apply(variables, x, gates=gates).pooled

    return jax.vmap(one)(stacked_variables, stacked_gates)


class EnsembleCCT(nn.Module):
    """CCT fusion head (ensemble_models.py:116-151) — structurally the 'vit'
    single-token path of EnsMLP; kept as its own class for name parity."""

    num_classes: int = 100
    sub_size: int = 256
    num_divisions: int = 4
    teacher_size: Optional[int] = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Array, *, distill: bool = False, train: bool = False):
        D, B, C = features.shape
        fused = features.transpose(1, 0, 2).reshape(B, D * C).astype(self.dtype)
        token = None
        if self.teacher_size is not None:
            fused = nn.Dense(self.teacher_size, dtype=self.dtype,
                             kernel_init=trunc_init, name="cls_mlp")(fused)
            token = fused
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          kernel_init=trunc_init, name="cls_classifier")(fused)
        logits = logits.astype(jnp.float32)
        if distill and train and self.teacher_size is not None:
            return EnsOutput(logits=logits, cls_logits=logits, ens_tokens=token)
        return EnsOutput(logits=logits, cls_logits=logits)


def ensemble_forward(
    model: VisionTransformer,
    ens_model: EnsMLP,
    stacked_variables,
    ens_variables,
    x: Array,
    stacked_gates: Optional[Gates] = None,
    *,
    distill: bool = False,
    train: bool = False,
    rng=None,
) -> EnsOutput:
    """The full collaborative-inference path: MultiViT -> EnsMLP
    (engine.py:213-242 / the north-star benchmark path). train=True enables
    backbone dropout/stochastic depth too (rng required) — the composed path
    must not silently drop the regularization the train steps apply."""
    cls_t, dist_t = multivit_features(model, stacked_variables, x, stacked_gates,
                                      train=train, rng=rng)
    return ens_model.apply(ens_variables, cls_t, dist_t, distill=distill, train=train)
