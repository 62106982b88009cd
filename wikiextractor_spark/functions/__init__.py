from wikiextractor_spark.functions.bm25 import (  # noqa: F401
    BM25Model,
    bm25_score_column,
    bm25_scores,
    bm25_topk,
    fit_bm25,
    fit_bm25_index,
    update_bm25_index,
)
from wikiextractor_spark.functions.cleaning import (  # noqa: F401
    clean_markup_native,
    clean_markup_duckdb_sql,
    NATIVE_STEPS,
)
from wikiextractor_spark.functions.html import (  # noqa: F401
    html_to_text,
    html_to_text_duckdb_sql,
)
from wikiextractor_spark.functions.tokenizer import (  # noqa: F401
    bpe_decode_ids,
    bpe_token_count,
    bpe_token_count_exact,
    bpe_token_ids,
    learn_bpe_merges,
    load_bpe_merges,
    load_bpe_merges_txt,
    load_bpe_vocab,
    load_bpe_vocab_json,
    merges_from_pairs,
    save_bpe_merges,
    save_bpe_vocab,
    train_bpe_tokenizer,
    vocab_from_tokens,
)
from wikiextractor_spark.functions.normalize import (  # noqa: F401
    maybe_denormalized,
    normalize_if_needed,
    strip_accents,
    unicode_normalize,
)
from wikiextractor_spark.functions.wordpiece import (  # noqa: F401
    basic_tokenize_text,
    learn_wordpiece_merges,
    learn_wordpiece_vocab,
    load_wordpiece_vocab,
    load_wordpiece_vocab_txt,
    save_wordpiece_vocab,
    wordpiece_decode_ids,
    wordpiece_from_tokens,
    wordpiece_token_count,
    wordpiece_token_ids,
)
from wikiextractor_spark.functions.unigram import (  # noqa: F401
    load_unigram_lm,
    save_unigram_lm,
    unigram_from_tokens,
    unigram_token_count,
    unigram_token_ids,
)
