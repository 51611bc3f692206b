"""Text constants shared by the tokenizer and the segmenter.

Same punctuation inventory as the reference (``lnasr/utils.py:13-49``).
"""

PUNCTUATION_ASCII = frozenset(".,?!\"':;()[]{}")

PUNCTUATION_UNICODE = frozenset(
    "。，？！：；、"
    "‘’“”—《》"
    "（）【】"
)
