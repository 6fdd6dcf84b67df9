"""Minimal offline tokenizer for pipeline tests (network-free substitute for
the reference's hub-downloaded unit-test tokenizers)."""


class ToyTokenizer:
    """Word-level with a fixed hash vocabulary; supports the subset of the HF
    tokenizer API the pipeline touches."""

    chat_template = None
    bos_token = "<s>"
    eos_token = "</s>"
    model_max_length = 10**9

    def __init__(self, vocab_size=1024):
        self.vocab_size = vocab_size
        self.bos_token_id = 1
        self.eos_token_id = 2
        self._id2tok = {}

    def _tok2id(self, tok):
        if tok == self.bos_token:
            return self.bos_token_id
        if tok == self.eos_token:
            return self.eos_token_id
        import zlib

        # deterministic across processes (str hash is PYTHONHASHSEED-random;
        # batched-vs-single argmax near-ties would make tests flaky per run)
        i = 3 + (zlib.crc32(tok.encode()) % (self.vocab_size - 3))
        self._id2tok.setdefault(i, tok)
        return i

    def encode(self, text, add_special_tokens=False, **kw):
        toks = text.split()
        ids = [self._tok2id(t) for t in toks]
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids

    def decode(self, ids, skip_special_tokens=True):
        toks = []
        for i in ids:
            if skip_special_tokens and i in (self.bos_token_id, self.eos_token_id, 0):
                continue
            toks.append(self._id2tok.get(int(i), f"<{int(i)}>"))
        return " ".join(toks)
