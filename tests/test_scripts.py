"""Smoke-run every workload script end-to-end on tiny synthetic data.

These drive the real CLI entry points (the framework's L6 layer) with 1-2
steps each, verifying wiring: generator -> model -> losses -> checkpoint.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import voxelmorph_tpu as vxm  # noqa: E402


RNG = np.random.default_rng(13)
SHAPE = (12, 12, 12)
TINY = ["--enc", "4", "8", "--dec", "8", "4"]
SHORT = ["--epochs", "1", "--steps-per-epoch", "2"]


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    d = tmp_path_factory.mktemp("scriptdata")
    grids = np.meshgrid(*[np.arange(s, dtype=float) for s in SHAPE], indexing="ij")
    files = []
    for i in range(3):
        c = [6 + RNG.uniform(-2, 2) for _ in range(3)]
        d2 = sum((g - cc) ** 2 for g, cc in zip(grids, c))
        vol = np.exp(-d2 / 16.0).astype(np.float32)
        seg = np.zeros(SHAPE, np.int32)
        seg[d2 < 4] = 1
        seg[(d2 >= 4) & (d2 < 9)] = 2
        path = str(d / f"scan{i}.npz")
        np.savez(path, vol=vol, seg=seg)
        files.append(path)
    (d / "list.txt").write_text("\n".join(files) + "\n")
    np.save(str(d / "labels.npy"), np.array([1, 2]))
    # atlas with vol + seg
    np.savez(str(d / "atlas.npz"), vol=np.exp(-sum((g - 6) ** 2 for g in grids) / 16.0)
             .astype(np.float32), seg=(sum((g - 6) ** 2 for g in grids) < 5).astype(np.int32))
    return d


def test_train_cache_device_and_bf16(data, tmp_path):
    """train.py with the HBM-resident dataset cache and bf16 compute."""
    import train as script
    script.main([
        "--img-list", str(data / "list.txt"),
        "--model-dir", str(tmp_path / "m"),
        "--cache-device", "--dtype", "bfloat16",
        "--int-steps", "2", *TINY, *SHORT,
    ])
    path = str(tmp_path / "m" / "0001.npz")
    assert os.path.isfile(path)
    # the checkpoint remembers the compute dtype
    import jax.numpy as jnp
    from voxelmorph_tpu.models import load_model
    model, params = load_model(path)
    assert model.dtype == jnp.bfloat16


def test_quality_eval_runner(data, tmp_path):
    """run_quality_eval drives the BASELINE protocol end-to-end and writes a
    well-formed report."""
    import json
    import train as train_script
    import run_quality_eval as evalr

    train_script.main([
        "--img-list", str(data / "list.txt"),
        "--model-dir", str(tmp_path / "m"),
        "--int-steps", "2", *TINY, *SHORT,
    ])
    pairs = str(tmp_path / "pairs.txt")
    scans = [str(data / f"scan{i}.npz") for i in range(3)]
    with open(pairs, "w") as f:
        f.write(f"{scans[0]} {scans[1]}\n{scans[1]} {scans[2]}\n")
    labels_npz = str(tmp_path / "labels.npz")
    np.savez(labels_npz, labels=np.array([1, 2]))
    out = str(tmp_path / "q.json")
    evalr.main(["--model", str(tmp_path / "m" / "0001.npz"),
                "--pairs", pairs, "--labels", labels_npz, "--out", out])
    report = json.load(open(out))
    assert report["n_pairs"] == 2
    assert 0.0 <= report["dice_mean"] <= 1.0
    assert "dice_identity_mean" in report and "pct_folded_voxels_mean" in report


def test_train_semisupervised_seg(data, tmp_path):
    import train_semisupervised_seg as script
    script.main([
        "--img-list", str(data / "list.txt"),
        "--img-suffix", "",
        "--seg-prefix", "",
        "--labels", str(data / "labels.npy"),
        "--model-dir", str(tmp_path / "m"),
        "--int-steps", "2", *TINY, *SHORT,
    ])
    assert os.path.isfile(str(tmp_path / "m" / "0001.npz"))


def test_train_template(data, tmp_path):
    import train_template as script
    script.main([
        "--img-list", str(data / "list.txt"),
        "--model-dir", str(tmp_path / "m"),
        "--image-loss", "mse", *TINY, *SHORT,
    ])
    assert os.path.isfile(str(tmp_path / "m" / "0001.npz"))


def test_train_cond_template(data, tmp_path):
    import train_cond_template as script
    files = vxm.py.utils.read_file_list(str(data / "list.txt"))
    csv = tmp_path / "pheno.csv"
    rows = ["file,age"] + [f"{os.path.basename(f)},{50 + i}" for i, f in enumerate(files)]
    csv.write_text("\n".join(rows) + "\n")
    script.main([
        "--img-list", str(data / "list.txt"),
        "--pheno-csv", str(csv),
        "--model-dir", str(tmp_path / "m"),
        "--image-loss", "mse", *TINY, *SHORT,
    ])
    assert os.path.isfile(str(tmp_path / "m" / "0001.npz"))


def test_train_hypermorph(data, tmp_path):
    import train_hypermorph as script
    script.main([
        "--img-list", str(data / "list.txt"),
        "--model-dir", str(tmp_path / "m"),
        "--int-steps", "2", *TINY, *SHORT,
    ])
    assert os.path.isfile(str(tmp_path / "m" / "0001.npz"))


def test_train_hypermorph_scanned_matches_per_step(data, tmp_path):
    """--steps-per-dispatch must reproduce the per-step cached path exactly
    (same picks, same lambda draws, same rng folding -> same params)."""
    import train_hypermorph as script
    common = [
        "--img-list", str(data / "list.txt"),
        "--int-steps", "2", "--cache-device", "--save-freq", "1", *TINY,
        "--epochs", "1", "--steps-per-epoch", "4",
    ]
    script.main(common + ["--model-dir", str(tmp_path / "a")])
    script.main(common + ["--model-dir", str(tmp_path / "b"),
                          "--steps-per-dispatch", "2"])
    a = np.load(str(tmp_path / "a" / "0001.npz"))
    b = np.load(str(tmp_path / "b" / "0001.npz"))
    assert set(a.files) == set(b.files)
    for k in a.files:
        if a[k].dtype.kind == "f":
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-7)


def test_train_hypermorph_cache_device_resume(data, tmp_path):
    import train_hypermorph as script
    common = [
        "--img-list", str(data / "list.txt"),
        "--model-dir", str(tmp_path / "m"),
        "--int-steps", "2", "--cache-device", "--save-freq", "1", *TINY,
    ]
    script.main(common + ["--epochs", "1", "--steps-per-epoch", "2"])
    assert os.path.isfile(str(tmp_path / "m" / "0001.npz"))
    # resume continues the device-cached stream and the lambda sequence
    script.main(common + ["--epochs", "2", "--steps-per-epoch", "2",
                          "--load-weights", "latest"])
    assert os.path.isfile(str(tmp_path / "m" / "0002.npz"))


def test_train_instance(data, tmp_path):
    import train_instance as script
    files = vxm.py.utils.read_file_list(str(data / "list.txt"))
    moved = str(tmp_path / "moved.nii.gz")
    warp = str(tmp_path / "warp.nii.gz")
    script.main([
        "--moving", files[0],
        "--fixed", files[1],
        "--moved", moved,
        "--warp", warp,
        "--steps", "10",
        "--int-steps", "2",
    ])
    assert vxm.py.utils.load_volfile(moved).shape == SHAPE
    assert vxm.py.utils.load_volfile(warp).shape == (*SHAPE, 3)


def test_train_synthmorph(data, tmp_path):
    import train_synthmorph as script
    # label maps as npy files in a directory
    lab_dir = tmp_path / "labels"
    lab_dir.mkdir()
    for i in range(2):
        np.save(str(lab_dir / f"map{i}.npy"),
                RNG.integers(0, 3, size=SHAPE).astype(np.int32))
    script.main([
        "--label-dir", str(lab_dir),
        "--model-dir", str(tmp_path / "m"),
        "--out-labels", "nonexistent.npy",  # fall back to all labels
        "--vel-res", "4",
        "--bias-res", "4",
        "--int-steps", "2",
        "--enc", "4", "8", "--dec", "8", "4", "4",
        "--epochs", "1", "--steps-per-epoch", "2",
    ])
    assert os.path.isfile(str(tmp_path / "m" / "00001.npz"))


def test_train_synthmorph_curriculum_terms(data, tmp_path):
    # bootstrap/curriculum phase: supervised flow + shared contrast + NCC
    # image term on top of the reference Dice+Grad loss set
    import train_synthmorph as script
    lab_dir = tmp_path / "labels"
    lab_dir.mkdir()
    for i in range(2):
        np.save(str(lab_dir / f"map{i}.npy"),
                RNG.integers(0, 3, size=SHAPE).astype(np.int32))
    script.main([
        "--label-dir", str(lab_dir),
        "--model-dir", str(tmp_path / "m"),
        "--out-labels", "nonexistent.npy",
        "--vel-res", "4",
        "--bias-res", "4",
        "--int-steps", "2",
        "--enc", "4", "8", "--dec", "8", "4", "4",
        "--same-subj", "--sup-flow-weight", "0.5",
        "--shared-contrast", "1.0", "--image-loss-weight", "1.0",
        "--bias-std", "0", "--gamma", "0",
        "--epochs", "1", "--steps-per-epoch", "2",
    ])
    assert os.path.isfile(str(tmp_path / "m" / "00001.npz"))


def test_train_and_test_unsupervised_seg(data, tmp_path):
    import train_unsupervised_seg as train_script
    import test_unsupervised_seg as test_script

    # probabilistic atlas with 3 label channels
    prob = RNG.random((*SHAPE, 3)).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    atlas_path = str(tmp_path / "prob_atlas.npz")
    np.savez(atlas_path, vol=prob)
    mapping_path = str(tmp_path / "mapping.npy")
    np.save(mapping_path, np.array([0, 1, 2, 2], np.int32))  # 4 full -> 3 tissue
    full_path = str(tmp_path / "full_atlas.npz")
    full = RNG.random((*SHAPE, 4)).astype(np.float32)
    np.savez(full_path, vol=full)

    model_dir = str(tmp_path / "m")
    train_script.main([
        "--img-list", str(data / "list.txt"),
        "--atlas", atlas_path,
        "--model-dir", model_dir,
        *TINY, *SHORT,
    ])
    ckpt = os.path.join(model_dir, "0001.npz")
    assert os.path.isfile(ckpt)

    files = vxm.py.utils.read_file_list(str(data / "list.txt"))
    seg_out = str(tmp_path / "seg.nii.gz")
    test_script.main([
        files[0], seg_out,
        "--model", ckpt,
        "--atlas", atlas_path,
        "--atlas-full", full_path,
        "--mapping", mapping_path,
        "--max-feats", "2",
        "--stats", str(tmp_path / "stats.npz"),
    ])
    seg = vxm.py.utils.load_volfile(seg_out)
    assert seg.shape == SHAPE
    assert seg.max() <= 3


def test_train_semisupervised_pointcloud(data, tmp_path):
    import train_semisupervised_pointcloud as script
    script.main([
        "--img-list", str(data / "list.txt"),
        "--atlas", str(data / "atlas.npz"),
        "--model-dir", str(tmp_path / "m"),
        "--surf-points", "40",
        "--surf-bidir",
        "--int-steps", "2", *TINY, *SHORT,
    ])
    assert os.path.isfile(str(tmp_path / "m" / "0001.npz"))


def test_register_hyper_vxm_joint(data, tmp_path):
    """register.py drives a HyperVxmJoint checkpoint (the SynthMorph
    affine+deformable product): --hyper feeds the amortized regularization
    weight and the fused call writes moved + warp volumes."""
    import jax
    import register as script
    from voxelmorph_tpu.models import HyperVxmJoint, save_model

    # >= nd+1 affine features: fewer landmarks make the 3-D LSQ fit
    # singular (NaN affine) by construction, same as the reference
    model = HyperVxmJoint(in_shape=SHAPE, int_steps=1, hyp_units=(2,),
                          enc_nf=(2,), dec_nf=(2,), add_nf=(2,),
                          aff_num_feat=8, aff_enc_nf=(4,))
    files = vxm.py.utils.read_file_list(str(data / "list.txt"))
    mv = vxm.py.utils.load_volfile(files[0], add_batch_axis=True,
                                   add_feat_axis=True).astype(np.float32)
    hyp = np.full((1, 1), 0.5, np.float32)
    params = model.init(jax.random.PRNGKey(0), hyp, mv, mv)["params"]
    ckpt = str(tmp_path / "joint.npz")
    save_model(ckpt, model, jax.device_get(params))

    moved_path = str(tmp_path / "moved.nii.gz")
    warp_path = str(tmp_path / "warp.nii.gz")
    script.main(["--moving", files[0], "--fixed", files[1],
                 "--model", ckpt, "--moved", moved_path,
                 "--warp", warp_path, "--hyper", "0.3"])
    moved = vxm.py.utils.load_volfile(moved_path)
    warp = vxm.py.utils.load_volfile(warp_path)
    assert moved.shape == SHAPE
    assert warp.shape == (*SHAPE, len(SHAPE))
    assert np.isfinite(moved).all() and np.isfinite(warp).all()

    # the Dice-eval runner takes the same checkpoint (fix for the
    # "any checkpoint drops into the inference CLIs" contract)
    import json
    import run_quality_eval as evalr
    pairs = str(tmp_path / "pairs.txt")
    with open(pairs, "w") as f:
        f.write(f"{files[0]} {files[1]}\n{files[1]} {files[2]}\n")
    out = str(tmp_path / "q.json")
    evalr.main(["--model", ckpt, "--pairs", pairs,
                "--labels", str(data / "labels.npy"),
                "--out", out, "--hyper", "0.3"])
    report = json.load(open(out))
    assert report["n_pairs"] == 2 and np.isfinite(report["dice_mean"])


def test_train_register_2d(data, tmp_path):
    """The whole CLI path is dimension-generic: 2-D scans train and register
    (the reference supports 2-D implicitly via ndims-parametrized models)."""
    import train as train_script
    import register as register_script

    S2 = (16, 16)
    grids = np.meshgrid(*[np.arange(s, dtype=float) for s in S2], indexing="ij")
    files = []
    for i in range(2):
        d2 = sum((g - 8 - i) ** 2 for g in grids)
        path = str(tmp_path / f"flat{i}.npz")
        np.savez(path, vol=np.exp(-d2 / 20.0).astype(np.float32))
        files.append(path)
    lst = tmp_path / "list2d.txt"
    lst.write_text("\n".join(files) + "\n")

    train_script.main([
        "--img-list", str(lst), "--model-dir", str(tmp_path / "m2d"),
        "--int-steps", "2", *TINY, *SHORT,
    ])
    moved = str(tmp_path / "moved.npz")
    warp = str(tmp_path / "warp.npz")
    register_script.main(["--moving", files[0], "--fixed", files[1],
                          "--model", str(tmp_path / "m2d" / "0001.npz"),
                          "--moved", moved, "--warp", warp])
    assert np.load(moved)["vol"].shape == S2
    assert np.load(warp)["vol"].shape == (*S2, 2)


def test_sweep_hypermorph(data, tmp_path):
    """Train a tiny HyperMorph, then sweep Dice over lambda with one compile."""
    import json
    import train_hypermorph as train_script
    import sweep_hypermorph as sweep_script

    train_script.main([
        "--img-list", str(data / "list.txt"),
        "--model-dir", str(tmp_path / "m"),
        "--int-steps", "2", *TINY, *SHORT,
    ])
    files = vxm.py.utils.read_file_list(str(data / "list.txt"))
    pairs = str(tmp_path / "pairs.txt")
    with open(pairs, "w") as f:
        f.write(f"{files[0]} {files[1]}\n")
    labels_npz = str(tmp_path / "labels.npz")
    np.savez(labels_npz, labels=np.array([1, 2]))
    out = str(tmp_path / "sweep.json")
    sweep_script.main(["--model", str(tmp_path / "m" / "0001.npz"),
                       "--pairs", pairs, "--labels", labels_npz,
                       "--lambdas", "0.1", "0.9", "--out", out])
    report = json.load(open(out))
    assert [r["lambda"] for r in report["sweep"]] == [0.1, 0.9]
    assert all(0.0 <= r["dice_mean"] <= 1.0 for r in report["sweep"])
