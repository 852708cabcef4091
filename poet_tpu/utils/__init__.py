from poet_tpu.utils import boxes, quaternions, rotations  # noqa: F401
