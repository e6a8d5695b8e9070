class Mixup:  # engine.py type-hints Optional[Mixup]; parity tests pass None
    def __init__(self, *a, **kw):
        raise NotImplementedError("shim Mixup is a type placeholder only")
