from xgeo_spark.functions.text import (  # noqa: F401
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    normalize_text,
    quality_score,
    ws_token_count,
)
