from .text import avg_word_len, stopword_ratio, word_shingles, words
from .vectors import cosine_similarity, dot_product, l2_norm

__all__ = [
    "words",
    "word_shingles",
    "avg_word_len",
    "stopword_ratio",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
