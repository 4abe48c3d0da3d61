"""Public column-function façade: every reusable column expression /
UDF the engine exposes, in one import.

    from pyontutils_spark import functions as PF
    df.select(PF.h32("text"), PF.token_count("text"))
"""

from ..operators.components import natsort_key_udf  # noqa: F401
from ..operators.dedup import (  # noqa: F401
    h32, hamming64, minhash_signature, ngram_shingles, simhash,
    tokens_col)
from ..operators.emit import page_iri_col  # noqa: F401
from ..operators.extract import (  # noqa: F401
    extract_if_missing_udf, extract_text_udf)
from ..operators.ordering import (  # noqa: F401
    obj_rank_udf, pred_rank_udf, subj_rank_udf)
from ..operators.simsearch import cosine_sim  # noqa: F401
from ..operators.textstats import (  # noqa: F401
    fingerprint, lang_id, token_count, word_token_count)
