from astrologer_ray.sources.corpus import (  # noqa: F401
    CORPUS_SCHEMA,
    generate_corpus,
    read_corpus,
)
from astrologer_ray.sources.jsonl import convert_jsonl_corpus  # noqa: F401
