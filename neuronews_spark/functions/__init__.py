from neuronews_spark.functions.normalize import (  # noqa: F401
    char_shingles,
    fuzzy_sort_key,
    minhash_band_keys,
    model_normalize,
    node_id,
    normalize_name,
    token_shingles,
    tokens,
)
