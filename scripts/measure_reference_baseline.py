#!/usr/bin/env python
"""Measure the reference implementation's CPU registration throughput.

Runs the ACTUAL reference code (/root/reference, torch backend — the TF
backend needs neurite, which this image lacks) on the canonical 160x192x224
volume, so bench.py's ``vs_baseline`` compares against a measured number of
the real reference stack rather than a stand-in. The reference's optional
host-side deps that are irrelevant to the forward pass (neurite's version
tag, pystrum, skimage) are satisfied with inert stubs; the model itself —
U-Net, VecInt, SpatialTransformer — is untouched reference code.

Run on an otherwise-idle host: `python scripts/measure_reference_baseline.py`.
"""

import os
import sys
import tempfile
import time

REFERENCE = "/root/reference"


def _write_stubs(root):
    os.makedirs(os.path.join(root, "pystrum", "pynd"), exist_ok=True)
    os.makedirs(os.path.join(root, "skimage"), exist_ok=True)
    with open(os.path.join(root, "neurite.py"), "w") as f:
        f.write('__version__ = "0.2"\n')
    for p in ("pystrum/__init__.py", "pystrum/pynd/__init__.py",
              "skimage/__init__.py"):
        open(os.path.join(root, p), "w").close()
    with open(os.path.join(root, "pystrum", "pynd", "ndutils.py"), "w") as f:
        f.write("def volsize2ndgrid(*a, **k):\n    raise NotImplementedError\n")
    with open(os.path.join(root, "skimage", "measure.py"), "w") as f:
        f.write("def label(*a, **k):\n    raise NotImplementedError\n"
                "def regionprops(*a, **k):\n    raise NotImplementedError\n")


def main():
    if not os.path.isdir(REFERENCE):
        print("reference checkout not found; nothing to measure")
        return
    stub_dir = tempfile.mkdtemp(prefix="vxm_ref_stubs_")
    _write_stubs(stub_dir)
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, stub_dir)
    os.environ["VXM_BACKEND"] = "pytorch"

    import numpy as np
    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    import voxelmorph as vxm  # the reference package

    inshape = (160, 192, 224)
    model = vxm.networks.VxmDense(inshape, int_steps=7, int_downsize=2)
    model.eval()
    src = torch.rand(1, 1, *inshape)
    trg = torch.rand(1, 1, *inshape)
    with torch.no_grad():
        t0 = time.perf_counter()
        model(src, trg)
        warm = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model(src, trg)
            times.append(time.perf_counter() - t0)
    steady = float(np.mean(times))
    print(f"reference torch-CPU VxmDense forward {inshape}: "
          f"first {warm:.2f}s, steady {steady:.3f}s "
          f"-> {1.0 / steady:.4f} pairs/s ({torch.get_num_threads()} threads)")


if __name__ == "__main__":
    main()
