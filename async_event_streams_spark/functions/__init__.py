"""Engine function library: Spark-native (JVM-side, codegen-friendly)
column expressions for text analysis, dedup sketches, and similarity —
the building blocks of the LLM-pipeline operators (SURVEY.md §2-C).
"""

from .text import tokens, shingles, minhash_hex, stopword_count  # noqa: F401
from .similarity import dot, cosine, lsh_planes, lsh_bucket  # noqa: F401
