"""Transcription rulesets.

Reference: TranscriptionRule / Language at /root/reference/src/lib.rs:1029-1045.
Rules MUST be lexicographically sorted (binary-search precondition noted at
src/lib.rs:1094-1096); we sort + validate at construction instead of trusting
the author.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

from .phonemes import Phoneme


@dataclass(frozen=True)
class TranscriptionRule:
    string: str
    phonemes: Tuple[Phoneme, ...]

    def __post_init__(self):
        object.__setattr__(self, "phonemes", tuple(Phoneme(int(p)) for p in self.phonemes))


@dataclass(frozen=True)
class Language:
    rules: Tuple[TranscriptionRule, ...]
    case_sensitive: bool = False
    name: str = ""

    def __post_init__(self):
        rules = tuple(sorted(self.rules, key=lambda r: r.string))
        if any(not r.string for r in rules):
            raise ValueError("empty rule strings are not allowed")
        object.__setattr__(self, "rules", rules)

    @staticmethod
    def from_pairs(pairs: Sequence[Tuple[str, Sequence[Phoneme]]],
                   case_sensitive: bool = False, name: str = "") -> "Language":
        return Language(
            rules=tuple(TranscriptionRule(s, tuple(p)) for s, p in pairs),
            case_sensitive=case_sensitive,
            name=name,
        )


__all__ = ["TranscriptionRule", "Language"]
