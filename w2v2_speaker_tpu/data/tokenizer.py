"""Character tokenizer for CTC speech recognition.

Equivalent of the reference's `Wav2vec2Tokenizer` wrapping HF's
`Wav2Vec2CTCTokenizer` (`/root/reference/src/tokenizer/tokenizer_wav2vec2.py:21-52`,
`base.py:17-47`): character vocabulary with blank/pad at index 0 (the CTC
blank contract, `ctc_loss.py:30`), '|' as the word delimiter, and CTC greedy
decoding (collapse repeats, drop blanks). The vocabulary is derived from the
training transcripts like the reference's LibriSpeech prep
(`librispeech.py:238-260`) and serialized to JSON.
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Iterable, List, Sequence

import numpy as np

__all__ = ["CharTokenizer"]

BLANK = "<pad>"  # doubles as the CTC blank, index 0
UNK = "<unk>"
WORD_DELIM = "|"

# canonical facebook/wav2vec2-base-960h letter vocabulary (the HF
# vocab.json the reference's tokenizer downloads,
# config/tokenizer/default.yaml): index order matches the pretrained CTC
# lm_head exactly, so ported checkpoints decode without remapping
_W2V2_960H_VOCAB = {
    "<pad>": 0, "<s>": 1, "</s>": 2, "<unk>": 3, "|": 4, "E": 5, "T": 6,
    "A": 7, "O": 8, "N": 9, "I": 10, "H": 11, "S": 12, "R": 13, "D": 14,
    "L": 15, "U": 16, "M": 17, "W": 18, "C": 19, "F": 20, "G": 21,
    "Y": 22, "P": 23, "B": 24, "V": 25, "K": 26, "'": 27, "X": 28,
    "J": 29, "Q": 30, "Z": 31,
}


class CharTokenizer:
    def __init__(self, vocab: Dict[str, int]):
        if vocab.get(BLANK) != 0:
            raise ValueError(f"vocab must map {BLANK!r} (CTC blank) to 0")
        self.vocab = dict(vocab)
        self.inverse = {i: c for c, i in vocab.items()}

    # ---------------------------------------------------------------- build

    @classmethod
    def build(cls, transcriptions: Iterable[str]) -> "CharTokenizer":
        chars = set()
        for text in transcriptions:
            chars.update(text.upper().replace(" ", WORD_DELIM))
        chars.discard(WORD_DELIM)
        vocab = {BLANK: 0, UNK: 1, WORD_DELIM: 2}
        for c in sorted(chars):
            vocab[c] = len(vocab)
        return cls(vocab)

    @classmethod
    def wav2vec2_base_960h(cls) -> "CharTokenizer":
        """Fixed facebook/wav2vec2-base-960h letter vocabulary (32 tokens)
        in checkpoint order — use with ported pretrained CTC heads."""
        return cls(dict(_W2V2_960H_VOCAB))

    @classmethod
    def load(cls, path: pathlib.Path | str) -> "CharTokenizer":
        return cls(json.loads(pathlib.Path(path).read_text()))

    def save(self, path: pathlib.Path | str) -> None:
        pathlib.Path(path).write_text(json.dumps(self.vocab, indent=2))

    # ------------------------------------------------------------- en/decode

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @property
    def blank_id(self) -> int:
        return 0

    def encode(self, text: str) -> np.ndarray:
        ids = [
            self.vocab.get(c, self.vocab[UNK])
            for c in text.upper().replace(" ", WORD_DELIM)
        ]
        return np.asarray(ids, dtype=np.int32)

    def decode(self, ids: Sequence[int], ctc: bool = True) -> str:
        out: List[str] = []
        prev = None
        for i in ids:
            i = int(i)
            if ctc and i == prev:
                prev = i
                continue
            prev = i
            if i == self.blank_id:
                continue
            tok = self.inverse.get(i, "")
            if tok in ("<s>", "</s>"):  # BOS/EOS of the HF letter vocab
                continue
            out.append(tok)
        text = "".join(out).replace(WORD_DELIM, " ")
        return " ".join(text.split())  # squeeze repeated spaces

    def decode_batch(
        self, logits: np.ndarray, lengths: np.ndarray
    ) -> List[str]:
        """Greedy CTC decode of [B, T, V] logits with valid lengths."""
        ids = np.argmax(logits, axis=-1)
        return [
            self.decode(ids[b, : int(lengths[b])]) for b in range(ids.shape[0])
        ]
