from .gorilla import decode_block, encode_block  # noqa: F401
