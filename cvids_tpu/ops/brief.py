"""BRIEF-256 binary descriptors with a fixed, reproducible test pattern.

Equivalent of the reference's DVision BRIEF extractor
(`/root/reference/server_pose_graph/src/utility/server_brief_extractor.cpp:6-30`,
`ThirdParty/DVision/BRIEF.cpp:43-106`): 256 pairwise intensity tests on a
σ=2-blurred patch. The reference ships its pattern in `brief_pattern.yml` to
stay compatible with a pretrained vocabulary; we generate our own pattern
deterministically (isotropic Gaussian, σ = patch/5, the classic BRIEF-II
recipe) and train vocabularies on descriptors from the same pattern, so the
pairing stays self-consistent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .hamming import pack_bits
from .image import bilinear_sample, gaussian_blur

__all__ = ["brief_pattern", "compute_brief", "BRIEF_BITS", "PATCH_HALF",
           "load_brief_pattern_yaml", "save_brief_pattern_yaml"]

BRIEF_BITS = 256
PATCH_HALF = 24  # pattern coordinates live in [-24, 24], as in DVision BRIEF


def brief_pattern(seed: int = 7, bits: int = BRIEF_BITS,
                  half: int = PATCH_HALF) -> np.ndarray:
    """(bits, 4) int32 array of (x1, y1, x2, y2) test offsets, fixed seed."""
    rng = np.random.default_rng(seed)
    sigma = half / 2.5
    pts = rng.normal(0.0, sigma, size=(bits, 4))
    return np.clip(np.round(pts), -half, half).astype(np.int32)


_DEFAULT_PATTERN = brief_pattern()


def compute_brief(img: jax.Array, xy: jax.Array,
                  pattern: np.ndarray | jax.Array | None = None,
                  blur_sigma: float = 2.0,
                  pre_blurred: bool = False) -> jax.Array:
    """Descriptors for keypoints.

    img: (H, W) grayscale; xy: (N, 2) float (x, y); returns (N, 8) uint32.
    Keypoints whose pattern taps fall outside the image read edge values
    (callers should gate keypoints PATCH_HALF away from the border, as the
    reference does by construction of its detector mask).
    """
    if pattern is None:
        pattern = _DEFAULT_PATTERN
    pattern = jnp.asarray(pattern, dtype=jnp.float32)  # (bits, 4)
    blurred = img if pre_blurred else gaussian_blur(img, blur_sigma, radius=4)

    # sample positions: (N, bits, 2) for each endpoint
    p1 = xy[:, None, :] + pattern[None, :, 0:2]
    p2 = xy[:, None, :] + pattern[None, :, 2:4]
    i1 = bilinear_sample(blurred, p1)
    i2 = bilinear_sample(blurred, p2)
    bits = (i1 < i2).astype(jnp.uint32)  # DVision: bit set iff I(p1) < I(p2)
    return pack_bits(bits)


def load_brief_pattern_yaml(path: str) -> np.ndarray:
    """Load a DVision BRIEF test pattern from the reference's
    `brief_pattern.yml` format (OpenCV FileStorage YAML with int lists
    x1, y1, x2, y2 — read at `/root/reference/server_pose_graph/src/
    server_brief_extractor.cpp:14-23`). Returns (bits, 4) int pattern
    usable as `compute_brief(..., pattern=...)`, making descriptors
    compatible with a vocabulary trained on that pattern."""
    import re

    text = open(path).read()
    cols = []
    for key in ("x1", "y1", "x2", "y2"):
        m = re.search(rf"^\s*{key}\s*:\s*\[([^\]]*)\]", text,
                      re.MULTILINE | re.DOTALL)
        if m is None:
            raise ValueError(f"pattern file missing key {key!r}: {path}")
        cols.append(np.asarray(
            [int(tok) for tok in m.group(1).replace(",", " ").split()],
            np.int32))
    x1, y1, x2, y2 = cols
    if not (len(x1) == len(y1) == len(x2) == len(y2)):
        raise ValueError("pattern list lengths differ")
    return np.stack([x1, y1, x2, y2], axis=1)


def save_brief_pattern_yaml(path: str, pattern: np.ndarray) -> None:
    """Write a pattern in the OpenCV-FileStorage YAML layout the reference
    reads (round-trips through `load_brief_pattern_yaml`)."""
    p = np.asarray(pattern, np.int64)
    with open(path, "w") as f:
        f.write("%YAML:1.0\n---\n")
        for key, col in zip(("x1", "y1", "x2", "y2"),
                            (p[:, 0], p[:, 1], p[:, 2], p[:, 3])):
            body = ", ".join(str(int(v)) for v in col)
            f.write(f"{key}: [ {body} ]\n")
