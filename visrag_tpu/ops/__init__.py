from .pooling import pool, wmean_pool, mean_pool, last_token_pool  # noqa: F401
from .attention import flash_attention, mha_reference  # noqa: F401
