from poet_tpu.ops.embeddings import (  # noqa: F401
    bbox_embedding_sine,
    position_embedding_sine,
)
from poet_tpu.ops.deform_attn import ms_deform_attn_xla  # noqa: F401
from poet_tpu.ops.hungarian import hungarian  # noqa: F401
