"""Reference-API parity sweep.

Every public symbol of the reference package (voxelmorph/py/utils.py,
generators.py, tf/utils/{utils,augment}.py, tf/layers.py, tf/losses.py,
tf/networks.py) must be reachable at the same dotted path in
voxelmorph_tpu, so reference user code ports without edits. Backend-bound
helpers with no TPU meaning (setup_device, get_backend, keras_transform)
are deliberately excluded — see PARITY.md.
"""

import voxelmorph_tpu as vxm

REFERENCE_API = {
    "py.utils": [
        "default_unet_features", "read_file_list", "read_pair_list",
        "load_volfile", "save_volfile", "load_labels", "load_pheno_csv",
        "pad", "resize", "dice", "affine_shift_to_matrix",
        "extract_largest_vol", "clean_seg", "clean_seg_batch",
        "filter_labels", "dist_trf", "signed_dist_trf", "vol_to_sdt",
        "vol_to_sdt_batch", "get_surface_pts_per_label",
        "edge_to_surface_pts", "sdt_to_surface_pts", "jacobian_determinant",
    ],
    "generators": [
        "volgen", "scan_to_scan", "scan_to_atlas", "semisupervised",
        "template_creation", "conditional_template_creation",
        "surf_semisupervised", "synthmorph",
    ],
    # reference vxm.utils = tf/utils/utils.py + augment.py
    "utils": [
        "value_at_location", "transform", "batch_transform", "compose",
        "rescale_dense_transform", "integrate_vec",
        "point_spatial_transformer", "is_affine_shape",
        "validate_affine_shape", "make_square_affine",
        "affine_add_identity", "affine_remove_identity", "invert_affine",
        "rescale_affine", "affine_to_dense_shift",
        "angles_to_rotation_matrix", "params_to_affine_matrix",
        "rotation_matrix_to_angles", "affine_matrix_to_params",
        "fit_affine", "draw_flip_matrix", "draw_swap_matrix",
        "draw_affine_params", "interpn", "resize",
    ],
    "layers": [
        "SpatialTransformer", "VecInt", "RescaleTransform",
        "ComposeTransform", "AddIdentity", "InvertAffine",
        "ParamsToAffineMatrix", "AffineToDenseShift", "DrawAffineParams",
    ],
    "losses": [
        "NCC", "MSE", "TukeyBiweight", "Dice", "Grad", "KL",
        "MutualInformation",
    ],
    "networks": [
        "VxmDense", "VxmDenseSemiSupervisedSeg",
        "VxmDenseSemiSupervisedPointCloud", "InstanceDense",
        "ProbAtlasSegmentation", "TemplateCreation",
        "ConditionalTemplateCreation", "Transform", "Unet", "HyperVxmDense",
        "VxmAffineFeatureDetector", "HyperVxmJoint",
    ],
}


def test_reference_api_parity():
    missing = []
    for dotted, symbols in REFERENCE_API.items():
        mod = vxm
        for part in dotted.split("."):
            mod = getattr(mod, part)
        missing += [f"{dotted}.{s}" for s in symbols if not hasattr(mod, s)]
    assert not missing, f"reference symbols unreachable: {missing}"
