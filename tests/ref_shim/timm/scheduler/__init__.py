def create_scheduler(args, optimizer):
    """Import-only stub: the trajectory tests drive optimizer steps directly
    and never build a timm scheduler."""
    raise NotImplementedError("ref_shim timm.scheduler is import-only")
