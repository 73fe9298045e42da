"""Core math substrate: Lie groups, camera models, robust costs, GN/LM driver."""

from ygz_tpu.core import lie, camera, robust, solver  # noqa: F401
