from xgeo_spark.functions.text import (  # noqa: F401
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    normalize_text,
    quality_score,
    ws_token_count,
)
from xgeo_spark.functions.vectors import (  # noqa: F401
    ivf_probe_cells,
    ivf_search,
    kmeans_refine,
    write_ivf_index,
)
