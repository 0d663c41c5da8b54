"""Public column-function facade (SURVEY §2.8 — the reusable pieces).

Import surface for engine users:

    from lgid_spark.functions import (
        char_ngrams_col, word_ngrams_col, morph_ngrams_col,  # F1-F3
        normalize_name,                                      # P3
        host_of, canonical_url, apply_domain_blocklist,     # web utils
        salted_repartition, with_bucket,                     # scale utils
    )
"""

from ..operators.lm import (  # noqa: F401
    char_ngrams_col,
    morph_ngrams_col,
    word_ngrams_col,
)
from ..operators.mentions import normalize_name  # noqa: F401
from ..pipeline import (  # noqa: F401
    apply_domain_blocklist,
    canonical_url,
    host_of,
    salted_repartition,
    with_bucket,
)
