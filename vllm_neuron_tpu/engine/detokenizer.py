# SPDX-License-Identifier: Apache-2.0
"""Incremental detokenization + stop-string handling (SURVEY.md §2.2 V10).

Streams text token-by-token without re-decoding the whole sequence: keeps a
small tail window of token ids and emits the stable text delta, handling
multi-token unicode (the '�' replacement char is held back until
resolved). Stop strings are matched on the accumulated text; output is
truncated at the earliest stop match (vLLM semantics: the stop string itself
is excluded)."""
from __future__ import annotations

from typing import Optional

from vllm_neuron_tpu.sampling.params import SamplingParams


class IncrementalDetokenizer:

    def __init__(self, tokenizer, sampling_params: SamplingParams,
                 prompt_token_ids: list[int]):
        self.tokenizer = tokenizer
        self.params = sampling_params
        self.skip_special = sampling_params.skip_special_tokens
        # Seed the window with prompt tail so leading-space rules behave as
        # if decoding continued from the prompt.
        self.token_ids: list[int] = list(prompt_token_ids[-8:])
        self.prefix_offset = 0
        self.read_offset = len(self.token_ids)
        self._decoded_prefix = self._decode(self.token_ids)
        self.output_text = ""
        self.stop: list[str] = list(sampling_params.stop or [])
        self.stopped_on: Optional[str] = None

    def _decode(self, ids: list[int]) -> str:
        if not ids:
            return ""
        return self.tokenizer.decode(ids,
                                     skip_special_tokens=self.skip_special)

    def append(self, new_token_ids: list[int]) -> str:
        """Feed newly sampled tokens; returns the new text delta (may be
        empty while a multi-byte char is incomplete)."""
        if not new_token_ids:
            return ""
        self.token_ids.extend(new_token_ids)
        full = self._decode(self.token_ids[self.prefix_offset:])
        prev = self._decode(
            self.token_ids[self.prefix_offset:self.read_offset])
        if full.endswith("�"):
            return ""  # hold back until the char completes
        delta = full[len(prev):]
        self.read_offset = len(self.token_ids)
        # Slide the window to bound re-decode cost.
        if self.read_offset - self.prefix_offset > 64:
            self.prefix_offset = self.read_offset - 16
        self.output_text += delta
        return delta

    def check_stop_strings(self) -> Optional[str]:
        """Returns the matched stop string (and truncates output_text) or
        None."""
        if not self.stop:
            return None
        for s in self.stop:
            pos = self.output_text.find(s)
            if pos != -1:
                self.output_text = self.output_text[:pos]
                self.stopped_on = s
                return s
        return None
