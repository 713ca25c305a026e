from astrologer_ray.sources.corpus import (  # noqa: F401
    CORPUS_SCHEMA,
    generate_corpus,
    read_corpus,
)
