from panacea_tpu.ops.attention import (  # noqa: F401
    attention,
    attention_xla,
    merge_heads,
    set_attention_impl,
    split_heads,
)
from panacea_tpu.ops.panorama import (  # noqa: F401
    NUM_VIEWS,
    merge_views,
    neighbor_kv,
    split_views,
)
