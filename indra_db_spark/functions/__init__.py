from indra_db_spark.functions.hashing import (  # noqa: F401
    agent_key_expr,
    fold_md5_64,
    fold_md5_64_py,
    matches_key_expr,
    matches_key_py,
    mods_key_expr,
    raw_id_expr,
    source_hash_expr,
)
from indra_db_spark.functions.textnorm import normalize_text_expr, normalize_text_py  # noqa: F401
from indra_db_spark.functions.extract_html import extract_text_py, extract_text_series  # noqa: F401
