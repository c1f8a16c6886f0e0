import numpy as np
import pytest

import voxelmorph_tpu.py.io as vio
import voxelmorph_tpu.py.ndimage as ndi
import voxelmorph_tpu.py.utils as putils
import voxelmorph_tpu.generators as generators


RNG = np.random.default_rng(4)


# ---------------------------------------------------------------- file IO

@pytest.mark.parametrize("ext", [".nii", ".nii.gz"])
def test_nifti_round_trip(tmp_path, ext):
    vol = RNG.normal(size=(6, 7, 8)).astype(np.float32)
    affine = np.eye(4)
    affine[:3, 3] = [1, 2, 3]
    path = str(tmp_path / f"vol{ext}")
    vio.write_nifti(path, vol, affine)
    back, aff = vio.read_nifti(path)
    np.testing.assert_allclose(back, vol, atol=1e-6)
    np.testing.assert_allclose(aff, affine, atol=1e-5)


def test_nifti_int_dtype(tmp_path):
    vol = RNG.integers(0, 100, size=(4, 5, 6)).astype(np.int16)
    path = str(tmp_path / "seg.nii.gz")
    vio.write_nifti(path, vol)
    back, _ = vio.read_nifti(path)
    assert back.dtype == np.int16
    np.testing.assert_array_equal(back, vol)


def test_nifti_qform_fallback(tmp_path):
    """Files with sform_code=0 but a quaternion qform (common tool output)
    must decode the qform instead of returning a bare pixdim affine."""
    import struct

    vol = RNG.normal(size=(4, 5, 6)).astype(np.float32)
    path = str(tmp_path / "q.nii")
    vio.write_nifti(path, vol)

    # rewrite the header: clear sform, set qform with a 90-degree rotation
    # about z (quaternion a=b=0... for Rz(90): a=cos45, d=sin45), zooms
    # (1.5, 2.0, 2.5), offset (10, -4, 7), qfac=+1
    import math
    a = math.cos(math.pi / 4)
    d = math.sin(math.pi / 4)
    raw = bytearray(open(path, "rb").read())
    struct.pack_into("<h", raw, 254, 0)  # sform_code = 0
    struct.pack_into("<h", raw, 252, 1)  # qform_code = 1
    struct.pack_into("<8f", raw, 76, 1.0, 1.5, 2.0, 2.5, 0, 0, 0, 0)  # pixdim
    struct.pack_into("<3f", raw, 256, 0.0, 0.0, d)  # quatern b, c, d
    struct.pack_into("<3f", raw, 268, 10.0, -4.0, 7.0)  # qoffset
    open(path, "wb").write(bytes(raw))

    back, aff = vio.read_nifti(path)
    np.testing.assert_allclose(back, vol, atol=1e-6)
    Rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    expect = np.eye(4)
    expect[:3, :3] = Rz @ np.diag([1.5, 2.0, 2.5])
    expect[:3, 3] = [10.0, -4.0, 7.0]
    np.testing.assert_allclose(aff, expect, atol=1e-5)


@pytest.mark.parametrize("ext", [".mgh", ".mgz"])
def test_mgh_round_trip(tmp_path, ext):
    vol = RNG.normal(size=(5, 6, 7)).astype(np.float32)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    affine[:3, 3] = [-2, 0, 4]
    path = str(tmp_path / f"vol{ext}")
    vio.write_mgh(path, vol, affine)
    back, aff = vio.read_mgh(path)
    np.testing.assert_allclose(back, vol, atol=1e-6)
    np.testing.assert_allclose(aff, affine, atol=1e-4)


def test_load_save_volfile(tmp_path):
    vol = RNG.normal(size=(4, 4, 4)).astype(np.float32)
    for name in ["a.nii.gz", "a.npz", "a.mgz"]:
        path = str(tmp_path / name)
        putils.save_volfile(vol, path)
        back = putils.load_volfile(path)
        np.testing.assert_allclose(back, vol, atol=1e-6)

    out = putils.load_volfile(str(tmp_path / "a.npz"), add_batch_axis=True, add_feat_axis=True)
    assert out.shape == (1, 4, 4, 4, 1)


def test_load_volfile_npz_var(tmp_path):
    path = str(tmp_path / "multi.npz")
    np.savez(path, vol=np.ones((3, 3)), seg=np.zeros((3, 3)))
    np.testing.assert_array_equal(putils.load_volfile(path, np_var="seg"), np.zeros((3, 3)))


# ---------------------------------------------------------------- ndimage

def test_zoom_shapes_and_nearest():
    x = np.arange(16).reshape(4, 4).astype(float)
    up = ndi.zoom(x, 2, order=0)
    assert up.shape == (8, 8)
    assert up[0, 0] == x[0, 0] and up[-1, -1] == x[-1, -1]
    down = ndi.zoom(x, 0.5, order=0)
    assert down.shape == (2, 2)


def test_gaussian_filter_preserves_mean():
    x = RNG.normal(size=(20, 20)) + 5.0
    y = ndi.gaussian_filter(x, 2.0)
    assert abs(y.mean() - x.mean()) < 0.05
    assert y.std() < x.std()


def test_label_components():
    bw = np.zeros((8, 8), bool)
    bw[:2, :2] = True      # component 1 (4 px)
    bw[5:, 5:] = True      # component 2 (9 px)
    lab = ndi.label_components(bw)
    assert lab.max() == 2
    assert len(np.unique(lab[:2, :2])) == 1
    assert len(np.unique(lab[5:, 5:])) == 1
    assert lab[0, 0] != lab[6, 6]
    assert (lab[bw] > 0).all() and (lab[~bw] == 0).all()


def test_distance_transform_edt():
    bw = np.ones((9, 9), bool)
    bw[4, 4] = False  # single background voxel at the center
    d = ndi.distance_transform_edt(bw)
    assert d[4, 4] == 0
    np.testing.assert_allclose(d[4, 6], 2.0, atol=1e-6)
    np.testing.assert_allclose(d[7, 8], np.hypot(3, 4), atol=1e-6)


def test_signed_dist_trf():
    bw = np.zeros((11, 11), bool)
    bw[4:7, 4:7] = True
    sdt = putils.signed_dist_trf(bw)
    assert sdt[5, 5] < 0  # inside
    assert sdt[0, 0] > 0  # outside
    assert abs(sdt[5, 8]) == 2.0


# ---------------------------------------------------------------- metrics etc.

def test_dice_perfect_and_disjoint():
    a = np.zeros((10, 10), int)
    a[2:5, 2:5] = 1
    np.testing.assert_allclose(putils.dice(a, a, labels=[1]), [1.0])
    b = np.zeros_like(a)
    b[6:9, 6:9] = 1
    np.testing.assert_allclose(putils.dice(a, b, labels=[1]), [0.0])


def test_dice_label_autodetect_excludes_zero():
    a = np.zeros((6, 6), int)
    a[1:3, 1:3] = 2
    d = putils.dice(a, a)
    assert d.shape == (1,)


def test_pad():
    x = np.ones((3, 3))
    padded, slices = putils.pad(x, (7, 7))
    assert padded.shape == (7, 7)
    assert padded.sum() == 9
    np.testing.assert_array_equal(padded[slices], x)


def test_affine_shift_to_matrix():
    trf = np.zeros(12)
    mat = putils.affine_shift_to_matrix(trf)
    np.testing.assert_allclose(mat, np.eye(4))


def test_extract_largest_vol_and_clean_seg():
    x = np.zeros((16, 16))
    x[2:10, 2:10] = 1   # big blob (64)
    x[13:15, 13:15] = 1  # small blob (4)
    big = putils.extract_largest_vol(x)
    assert big[5, 5] and not big[13, 13]
    cleaned = putils.clean_seg(x, std=1)
    assert cleaned[5, 5] == 1.0


def test_vol_to_sdt_and_surface_pts():
    x = np.zeros((16, 16))
    x[5:11, 5:11] = 1
    sdt = putils.vol_to_sdt(x)
    assert sdt.shape == x.shape
    pts = putils.sdt_to_surface_pts(sdt, 20, rng=RNG)
    assert pts.shape == (20, 2)
    # points should be near the boundary of the square
    d = np.abs(sdt[tuple(np.round(pts).astype(int).T)])
    assert d.max() <= 1.5


def test_jacobian_determinant_numpy():
    disp = np.zeros((6, 6, 6, 3))
    np.testing.assert_allclose(putils.jacobian_determinant(disp), 1.0, atol=1e-6)


def test_file_lists(tmp_path):
    p = tmp_path / "list.txt"
    p.write_text("a\nb\n\nc\n")
    assert putils.read_file_list(str(p)) == ["a", "b", "c"]
    assert putils.read_file_list(str(p), prefix="/x/", suffix=".nii") == \
        ["/x/a.nii", "/x/b.nii", "/x/c.nii"]
    pp = tmp_path / "pairs.txt"
    pp.write_text("a b\nc d\n")
    assert putils.read_pair_list(str(pp)) == [["a", "b"], ["c", "d"]]


def test_load_pheno_csv(tmp_path):
    p = tmp_path / "pheno.csv"
    p.write_text("file,age,sex\nscan1.npz,70.5,1\nscan2.npz,65.0,0\n")
    pheno, files = putils.load_pheno_csv(str(p), training_files=["/data/scan1.npz"])
    assert files == ["/data/scan1.npz"]
    np.testing.assert_allclose(pheno["/data/scan1.npz"], [70.5, 1.0])


# ---------------------------------------------------------------- generators

def _write_scans(tmp_path, n=3, shape=(8, 8, 8)):
    paths = []
    for i in range(n):
        path = str(tmp_path / f"scan{i}.npz")
        np.savez(path, vol=RNG.normal(size=shape).astype(np.float32),
                 seg=RNG.integers(0, 3, size=shape).astype(np.int32))
        paths.append(path)
    return paths


def test_scan_to_scan_generator(tmp_path):
    paths = _write_scans(tmp_path)
    gen = generators.scan_to_scan(paths, batch_size=2)
    invols, outvols = next(gen)
    assert len(invols) == 2 and len(outvols) == 2
    assert invols[0].shape == (2, 8, 8, 8, 1)
    assert outvols[1].shape == (2, 8, 8, 8, 3)  # zero warp


def test_scan_to_atlas_generator(tmp_path):
    paths = _write_scans(tmp_path)
    atlas = RNG.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)
    gen = generators.scan_to_atlas(paths, atlas, bidir=True)
    invols, outvols = next(gen)
    assert len(invols) == 2 and len(outvols) == 3
    np.testing.assert_array_equal(invols[1], atlas)


def test_semisupervised_generator(tmp_path):
    paths = _write_scans(tmp_path)
    segs = [p for p in paths]  # npz contain both keys; use seg var trick
    gen = generators.semisupervised(paths, seg_names=None, labels=[1, 2])
    # seg_names=None -> volgen(segs=None) yields only vols; use segs=True style instead
    # so test the atlas_file path with segs embedded:
    gen = generators.volgen(paths, segs=True)
    vol, seg = next(gen)
    assert vol.shape == (1, 8, 8, 8, 1)
    assert seg.shape == (1, 8, 8, 8, 1)


def test_synthmorph_generator():
    maps = [RNG.integers(0, 4, size=(8, 8, 8)) for _ in range(4)]
    gen = generators.synthmorph(maps, batch_size=2)
    (src, trg), voids = next(gen)
    assert src.shape == (2, 8, 8, 8, 1)
    assert trg.shape == (2, 8, 8, 8, 1)
    assert voids[0].shape == (2, 8, 8, 8, 3)
