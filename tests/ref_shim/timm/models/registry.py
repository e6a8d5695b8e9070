_model_entrypoints = {}


def register_model(fn):
    _model_entrypoints[fn.__name__] = fn
    return fn


def create_model(name, pretrained=False, **kwargs):
    return _model_entrypoints[name](pretrained=pretrained, **kwargs)
