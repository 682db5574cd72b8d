"""Asset helpers: the reference's test images/meshes with procedural
fallbacks (reference assets at /root/reference/images are read-only)."""
import os

import numpy as np

REF_IMAGES = "/root/reference/images"


def earthmap():
    """Linear-RGB earth texture [H, W, 3]; procedural fallback if the
    reference asset is unavailable."""
    path = os.path.join(REF_IMAGES, "earthmap.jpg")
    if os.path.exists(path):
        import raytrace_tpu as rt
        return rt.read_image(path)
    # fallback: blue marble-ish gradient with meridian stripes
    h, w = 256, 512
    v, u = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                       indexing="ij")
    land = (np.sin(u * 14) * np.cos(v * 9) > 0.3).astype(float)
    img = np.stack([0.1 + 0.4 * land, 0.2 + 0.5 * land, 0.6 - 0.4 * land],
                   axis=-1)
    return img


def obj_path(name: str) -> str:
    path = os.path.join(REF_IMAGES, name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{name} not found; the reference assets at {REF_IMAGES} are "
            "required for this scene")
    return path
