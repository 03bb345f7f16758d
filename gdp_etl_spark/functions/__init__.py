"""Expression library: Column → Column pure functions, no UDFs."""

from .expressions import (  # noqa: F401
    bankers_round,
    conditional_overwrite,
    davg,
    dsum,
    isin_values,
    near,
    pad_code,
    prefer_new,
    recode,
    ref_date,
    sum_na_zero,
    year_of,
)
from .text import (  # noqa: F401
    fingerprint,
    lang_id,
    mean_token_len,
    punct_ratio,
    quality_score,
    rolling_content_hash,
    shingles,
    stopword_ratio,
    token_count_bpe,
    token_count_ws,
    ws_tokens,
)
from .vectors import (  # noqa: F401
    cosine,
    cosine_exact,
    dot,
    dot_fixed,
    norm,
)
