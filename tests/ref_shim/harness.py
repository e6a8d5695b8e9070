"""Shared cross-framework harness pieces used by BOTH parity suites
(tests/test_reference_e2e.py and tests/test_chain_parity.py) — one
definition so the two suites cannot drift apart in what they record."""

import torch


class RecordingScaler:
    """NativeScaler stand-in for CPU: backward + optional clip + step,
    recording the per-step loss (the quantity under comparison)."""

    def __init__(self):
        self.losses = []

    def __call__(self, loss, optimizer, clip_grad=None, parameters=None,
                 create_graph=False):
        self.losses.append(float(loss.detach()))
        loss.backward(create_graph=create_graph)
        if clip_grad:
            torch.nn.utils.clip_grad_norm_(parameters, clip_grad)
        optimizer.step()
