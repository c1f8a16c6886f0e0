"""End-to-end: train -> checkpoint -> register -> dice-eval via the CLI
scripts, on tiny synthetic volumes. This is the framework's equivalent of the
reference's evaluation-as-test path (SURVEY §3.3)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import voxelmorph_tpu as vxm  # noqa: E402


RNG = np.random.default_rng(7)
SHAPE = (12, 12, 12)


def _make_blob(center, size=3.0):
    grids = np.meshgrid(*[np.arange(s, dtype=float) for s in SHAPE], indexing="ij")
    d2 = sum((g - c) ** 2 for g, c in zip(grids, center))
    vol = np.exp(-d2 / (2 * size ** 2)).astype(np.float32)
    seg = (d2 < size ** 2).astype(np.int32)
    return vol, seg


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    files = []
    for i in range(4):
        center = [6 + RNG.uniform(-2, 2) for _ in range(3)]
        vol, seg = _make_blob(center)
        path = str(d / f"scan{i}.npz")
        np.savez(path, vol=vol, seg=seg)
        files.append(path)
    (d / "list.txt").write_text("\n".join(files) + "\n")
    (d / "pairs.txt").write_text(f"{files[0]} {files[1]}\n{files[2]} {files[3]}\n")
    return d


def test_train_register_test_scripts(data_dir, tmp_path):
    import train as train_script
    import register as register_script
    import test as test_script

    model_dir = str(tmp_path / "models")

    # --- train a couple of epochs (tiny unet to keep the test fast)
    train_script.main([
        "--img-list", str(data_dir / "list.txt"),
        "--model-dir", model_dir,
        "--epochs", "2",
        "--steps-per-epoch", "2",
        "--int-steps", "2",
        "--enc", "4", "8",
        "--dec", "8", "4",
        "--lr", "1e-3",
    ])
    ckpt = os.path.join(model_dir, "0002.npz")
    assert os.path.isfile(ckpt)
    assert os.path.isfile(os.path.join(model_dir, "0000.npz"))

    # --- register a pair
    files = vxm.py.utils.read_file_list(str(data_dir / "list.txt"))
    moved_path = str(tmp_path / "moved.nii.gz")
    warp_path = str(tmp_path / "warp.nii.gz")
    register_script.main([
        "--moving", files[0],
        "--fixed", files[1],
        "--model", ckpt,
        "--moved", moved_path,
        "--warp", warp_path,
    ])
    moved = vxm.py.utils.load_volfile(moved_path)
    assert moved.shape == SHAPE
    warp = vxm.py.utils.load_volfile(warp_path)
    assert warp.shape == (*SHAPE, 3)

    # --- warp script applies the saved warp
    import warp as warp_script
    rewarped_path = str(tmp_path / "rewarped.nii.gz")
    warp_script.main([
        "--moving", files[0],
        "--warp", warp_path,
        "--moved", rewarped_path,
    ])
    rewarped = vxm.py.utils.load_volfile(rewarped_path)
    np.testing.assert_allclose(rewarped, moved, atol=1e-4)

    # --- dice eval over the pair list
    test_script.main([
        "--model", ckpt,
        "--pairs", str(data_dir / "pairs.txt"),
        "--img-suffix", "",
        "--seg-prefix", "",
    ])


def test_training_reduces_loss(data_dir):
    """A short training run should reduce the loss on a fixed toy problem."""
    from voxelmorph_tpu.models import VxmDense
    from voxelmorph_tpu.training import LossTerm, Trainer

    files = vxm.py.utils.read_file_list(str(data_dir / "list.txt"))

    model = VxmDense(inshape=SHAPE, int_steps=2,
                     nb_unet_features=[[4, 8], [8, 4]])
    terms = [
        LossTerm("y_source", vxm.losses.MSE().loss, weight=1.0, target_index=0),
        LossTerm("reg", vxm.losses.Grad("l2", loss_mult=2).loss,
                 weight=0.01, target_index=1, name="grad"),
    ]
    trainer = Trainer(model, terms, lr=1e-3)

    # deterministic overfit on one fixed (distinct) pair
    src = vxm.py.utils.load_volfile(files[0], add_batch_axis=True, add_feat_axis=True)
    trg = vxm.py.utils.load_volfile(files[1], add_batch_axis=True, add_feat_axis=True)
    zeros = np.zeros((1, *SHAPE, 3), np.float32)
    inputs, targets = (src, trg), (trg, zeros)

    trainer.init(inputs)
    first = float(trainer.train_step(inputs, targets)["loss"])
    for _ in range(15):
        metrics = trainer.train_step(inputs, targets)
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.9, (first, last)
