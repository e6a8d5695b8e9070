import torch


def accuracy(output, target, topk=(1,)):
    """timm.utils.accuracy: top-k percentage."""
    maxk = max(topk)
    batch = target.size(0)
    _, pred = output.topk(maxk, 1, True, True)
    pred = pred.t()
    correct = pred.eq(target.reshape(1, -1).expand_as(pred))
    return [correct[:k].reshape(-1).float().sum(0) * 100.0 / batch for k in topk]


class ModelEma:
    """Minimal EMA-of-weights holder (timm legacy ModelEma contract)."""

    def __init__(self, model, decay=0.9999, device="", resume=""):
        import copy

        self.ema = copy.deepcopy(model)
        self.ema.eval()
        self.decay = decay
        for p in self.ema.parameters():
            p.requires_grad_(False)

    @torch.no_grad()
    def update(self, model):
        esd = self.ema.state_dict()
        msd = model.state_dict()
        for k, v in esd.items():
            if v.dtype.is_floating_point:
                v.copy_(v * self.decay + msd[k].detach() * (1.0 - self.decay))


class NativeScaler:
    """CPU-functional NativeScaler (timm contract): no AMP scaling on CPU —
    backward, optional clip, step. State dict round-trips as empty."""

    def __call__(self, loss, optimizer, clip_grad=None, parameters=None,
                 create_graph=False):
        loss.backward(create_graph=create_graph)
        if clip_grad:
            torch.nn.utils.clip_grad_norm_(parameters, clip_grad)
        optimizer.step()

    def state_dict(self):
        return {}

    def load_state_dict(self, state):
        pass
