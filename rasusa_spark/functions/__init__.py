"""Column-level function surface: re-exports of the engine's scalar/vector
helpers so user code can `from rasusa_spark.functions import ...`."""

from ..operators.similarity import cosine_similarity_col  # noqa: F401
from ..operators.text import (  # noqa: F401
    bpe_ish_token_count,
    content_hash,
    lang_id_udf,
    quality_features,
    redact_pii,
    repetition_features,
    rolling_fingerprint_udf,
    token_count,
)
from ..rng import pcg64_bernoulli_keys  # noqa: F401
from ..sampler import (  # noqa: F401
    normalize_fraction,
    parse_coverage,
    parse_metric_size,
    target_bases_from_coverage,
)
