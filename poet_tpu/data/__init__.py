from poet_tpu.data.structures import Targets, pad_targets  # noqa: F401
