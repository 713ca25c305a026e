from astrologer_ray.functions.tokenizer import (  # noqa: F401
    CodeTokenizer,
    scrub_text,
    tokenize,
    token_counts,
)
from astrologer_ray.functions.codec import (  # noqa: F401
    varbyte_encode,
    varbyte_decode,
    encode_chunk,
    decode_chunk,
)
