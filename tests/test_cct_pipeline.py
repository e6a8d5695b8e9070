"""CCT family through the pipeline: DEKD distillation and collaborative
ensemble (BASELINE config row 4: 4-way decomposed CCT with DEKD)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devit_tpu.cli.__main__ import build_parser
from devit_tpu.models.cct import create_cct
from devit_tpu.models.vit import Gates
from devit_tpu.train import steps as S
from devit_tpu.train.optim import OptimConfig, make_optimizer
from devit_tpu.train.state import TrainState

TINY = [
    # 4 heads: the shrink stage's 2%-window rejection sampling needs finer
    # head-keep quantization than 2 heads allows at this tiny geometry
    "--input-size", "32", "--embed-dim", "64", "--depth", "2", "--num-heads", "4",
    "--drop-path", "0.0",
]
OPT = [
    "--batch-size", "32", "--eval-batch-size", "64", "--epochs", "1",
    "--warmup-epochs", "0", "--cooldown-epochs", "0", "--lr", "1e-3",
]
DATA = ["--dataset", "synthetic:8:192:32", "--num_division", "2"]


def test_cct_dekd_step():
    """DEKD works with CCT student + CCT teacher through the generic step."""
    student = create_cct("cct_2_3x1_32", num_classes=5, dtype=jnp.float32,
                         num_layers=2, embed_dim=64, num_heads=2,
                         stochastic_depth=0.0, attention_dropout=0.0, dropout=0.0)
    teacher = create_cct("cct_2_3x1_32", num_classes=5, dtype=jnp.float32,
                         num_layers=2, embed_dim=128, num_heads=4,
                         stochastic_depth=0.0, attention_dropout=0.0, dropout=0.0)
    x = jnp.ones((4, 32, 32, 3))
    sp = student.init(jax.random.key(0), x, capture_qkv="middle")["params"]
    tv = teacher.init(jax.random.key(1), x, capture_qkv="middle")
    tx = make_optimizer(OptimConfig(lr=1e-3, epochs=1, warmup_epochs=0, cooldown_epochs=0), 5)
    state = TrainState.create(sp, tx)
    step = jax.jit(S.make_dekd_step(student, teacher, distillation_type="hard"))
    L = student.cfg.depth
    gates = Gates(jnp.ones((L, 2)), jnp.ones((L, student.cfg.hidden_dim)))
    state2, metrics = step(state, tv, gates, x, jnp.array([0, 1, 2, 3]), jax.random.key(2))
    for k in ("loss", "q_loss", "k_loss", "v_loss"):
        assert np.isfinite(float(metrics[k])), k


def run(argv):
    args = build_parser().parse_args(argv)
    return args.fn(args)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cct_pipe"))


# learning-assertion recipe for the CCT stage tests (VERDICT r2 missing #3
# applied to the CCT leg too: `best >= 0` is vacuous). Calibration on this
# exact config: train_sub 60.6 (division chance 25), ensemble 21.4 (full
# chance 12.5) — thresholds leave margin but reject chance-level runs.
OPT3 = ["--batch-size", "32", "--eval-batch-size", "64", "--epochs", "3",
        "--warmup-epochs", "0", "--cooldown-epochs", "0", "--lr", "2e-3",
        "--no-scale-lr"]
NOMIX = ["--mixup", "0", "--cutmix", "0", "--reprob", "0",
         "--color-jitter", "0"]


def test_cct_train_sub_stage(workdir):
    out = os.path.join(workdir, "sub-dataset0")
    best = run([
        "train_sub", *TINY, *OPT3, *DATA, *NOMIX,
        "--model", "cct_2_3x1_32",
        "--start-division", "0", "--output_dir", out,
        "--no-repeated-aug", "--aa", "", "--no-model-ema",
    ])
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))
    assert best > 45.0, f"CCT stage 2 did not learn: acc1 {best:.1f} (chance 25)"


def test_cct_ensemble_stage(workdir):
    out = os.path.join(workdir, "ens")
    best = run([
        "ensemble", *TINY, *OPT3, *DATA, *NOMIX,
        "--model", "cct_2_3x1_32",
        "--teacher-size", "48",
        "--distillation-type", "none",
        "--output_dir", out,
        "--no-repeated-aug", "--aa", "",
    ])
    assert os.path.exists(os.path.join(out, "checkpoint.msgpack"))
    assert best > 17.0, f"CCT ensemble did not learn: acc1 {best:.1f} (chance 12.5)"


def test_cct_shrink_stage(workdir):
    """Stage 3 on a CCT model: capture_rank_stats drives the HSIC ranking
    exactly like the ViT path (cct.py:14-15's shrink claim, previously a
    TypeError because CCT lacked the capture)."""
    out = os.path.join(workdir, "cct_shrink0")
    result = run([
        "shrink", *TINY, *OPT, *DATA,
        "--model", "cct_2_3x1_32",
        "--model-path", os.path.join(workdir, "sub-dataset0", "checkpoint.msgpack"),
        "--start-division", "0", "--output_dir", out,
        "--population", "3", "--shrink-ratio", "0.3", "--ub", "0.8",
        "--candidate-chunk", "2",
    ])
    pols = np.load(os.path.join(out, "shrinked_policy.npy"))
    accs = np.load(os.path.join(out, "shrinked_accuracy.npy"))
    assert pols.shape == (3, 4) and accs.shape == (3,)  # 2 layers -> 4 dims
    assert np.isfinite(accs).all()
    # the gated eval really ran on the TRAINED checkpoint: the best candidate
    # must stay above division chance (25%), not collapse to a broken forward
    assert accs.max() > 25.0, f"all gated candidates at/below chance: {accs}"


def test_cct_rank_capture_shapes():
    model = create_cct("cct_2_3x1_32", img_size=32, embed_dim=64, num_heads=2,
                       num_classes=5, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    v = model.init(jax.random.key(0), x)
    out = model.apply(v, x, capture_rank_stats=True)
    L, H, D = 2, 2, 64
    hid = int(D * model.cfg.mlp_ratio)
    N = out.neuron_act.shape[2]
    assert out.neuron_act.shape == (L, 2, N, hid)
    assert out.head_out.shape == (L, 2, N, H, D // H)


def test_cct_pipeline_orchestrator(tmp_path_factory):
    """`devit pipeline --model cct_*`: the orchestrator drives the SECOND
    model family end-to-end — split/train/shrink/distill/ensemble — and
    skips the ViT-only deploy stage with an explanatory note (CCT serves via
    the gated stacked path; compaction is ragged-ViT machinery)."""
    root = str(tmp_path_factory.mktemp("cct_oneshot"))
    results = run([
        "pipeline", *TINY, *OPT, *DATA,
        "--model", "cct_2_3x1_32",
        # CCT DEKD needs a CCT teacher (the relation loss compares NxN
        # token-Gram matrices, so teacher seq must match)
        "--teacher-model", "cct_2_3x1_32",
        "--no-repeated-aug", "--aa", "", "--no-model-ema",
        "--mixup", "0", "--cutmix", "0", "--reprob", "0",
        "--shrink-ratio", "0.3", "--ub", "0.8", "--population", "2",
        "--candidate-chunk", "2",
        "--teacher-size", "48",
        "--output_dir", root,
    ])
    for art in [
        "division2/manifest.json",
        "sub-model0/checkpoint.msgpack", "sub-model1/checkpoint.msgpack",
        "shrink0/shrinked_policy.npy", "shrink1/shrinked_policy.npy",
        "sub-dataset0/checkpoint.msgpack", "sub-dataset1/checkpoint.msgpack",
        "ensemble/checkpoint.msgpack",
    ]:
        assert os.path.exists(os.path.join(root, art)), art
    assert not os.path.exists(os.path.join(root, "deploy"))
    assert "ensemble" in results
    # the CCT ensemble applies + persists the distill-stage shrink gates
    # (same resolved reference bug as the ViT family)
    from devit_tpu.io.checkpoint import restore_pytree
    ens_ckpt = restore_pytree(os.path.join(root, "ensemble", "checkpoint.msgpack"), None)
    assert "gates" in ens_ckpt, sorted(ens_ckpt)
    import numpy as np
    head = np.asarray(ens_ckpt["gates"]["head"])
    assert head.shape[0] == 2 and set(np.unique(head)) <= {0.0, 1.0}
    assert head.min() == 0.0  # some heads actually pruned at ratio 0.3
    # the skip note is logged after the last stage, so the active log file is
    # whichever stage redirected the handler last — scan them all
    logs = ""
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n == "log.txt":
                with open(os.path.join(dirpath, n)) as f:
                    logs += f.read()
    assert "deploy (ragged compaction) is ViT-only" in logs
