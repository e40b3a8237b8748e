"""vmap_tpu — TPU-native object-level neural-field SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of kxhit/vMAP
(vectorised multi-object neural field mapping, arXiv:2302.01838): every object
instance gets its own tiny occupancy-field MLP, and all objects are optimised
simultaneously in a single jit-compiled device dispatch over a fixed-capacity
stacked "object bank".

Key architectural differences from the PyTorch/functorch reference:
  * Fixed-capacity stacked parameter banks + an active mask instead of
    functorch ``combine_state_for_ensemble`` rebuilt per new object
    (reference: train.py:179-183, utils.py:30-34).
  * One jitted train step per frame — keyframe/pixel/depth-guided 3D sampling,
    positional encoding, ensemble MLP, volume rendering, masked losses and the
    masked AdamW update all run on device under ``lax.scan``
    (reference: python loop train.py:270-326).
  * A deduplicated global frame pool instead of per-object full-frame keyframe
    buffers (reference: vmap.py:129-176 stores each RGB-D frame once per
    object; we store each frame once globally and gather).
  * Adam moments persist when new objects appear (the reference silently
    resets them on every ensemble rebuild, train.py:179-183).
"""

__version__ = "0.1.0"

from vmap_tpu.config import Config  # noqa: F401
