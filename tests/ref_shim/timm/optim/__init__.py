def create_optimizer(args, model):
    """Import-only stub: the trajectory tests construct torch.optim.AdamW
    explicitly so the optimizer config is pinned in the test."""
    raise NotImplementedError("ref_shim timm.optim is import-only")
