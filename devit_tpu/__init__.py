"""devit_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of
falcon-xu/DeViT: decompose a large ViT into class-disjoint sub-models, shrink
them (HSIC-ranked head/neuron pruning under a MACs budget), distill with DEKD,
and recombine via token-fusion ensemble — collaborative inference mapped onto
TPU sub-meshes."""

__version__ = "0.4.0"
