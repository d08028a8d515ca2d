"""shm3d: a TPU-native framework for generalized signed distance in 3D.

A from-scratch JAX/XLA/Pallas implementation of the Signed Heat Method
(Feng & Crane, SIGGRAPH 2024) with the capabilities of the reference C++
implementation nzfeng/signed-heat-3d, re-designed TPU-first (SURVEY.md §7).
"""

from .config import LevelSetConstraint, SignedHeatOptions

__version__ = "0.1.0"
__all__ = ["LevelSetConstraint", "SignedHeatOptions"]
