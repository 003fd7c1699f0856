"""Chat prompt builders for MMU training data.

Reference: ``models/cobra/backbones/llm/prompting/base_prompter.py`` +
``mamba_prompter.py`` — the Mamba builder wraps turns as
``In: {msg}\\nOut: `` / ``{msg}<|endoftext|>`` with no BOS.
"""

from __future__ import annotations

from typing import Optional


class PromptBuilder:
    def __init__(self, model_family: str, system_prompt: Optional[str] = None) -> None:
        self.model_family = model_family
        self.system_prompt = system_prompt

    def add_turn(self, role: str, message: str) -> str:
        raise NotImplementedError

    def get_potential_prompt(self, user_msg: str) -> str:
        raise NotImplementedError

    def get_prompt(self) -> str:
        raise NotImplementedError


class MambaPromptBuilder(PromptBuilder):
    """Port of ``mamba_prompter.py:5-51`` (byte-identical prompt strings)."""

    def __init__(self, model_family: str, system_prompt: Optional[str] = None) -> None:
        super().__init__(model_family, system_prompt)
        self.bos, self.eos = "", "<|endoftext|>"
        self.wrap_human = lambda msg: f"In: {msg}\nOut: "
        self.wrap_gpt = lambda msg: f"{msg if msg != '' else ' '}{self.eos}"
        self.prompt, self.turn_count = "", 0

    def add_turn(self, role: str, message: str) -> str:
        assert (role == "human") if (self.turn_count % 2 == 0) else (role == "gpt")
        message = message.replace("<image>", "").strip()
        if (self.turn_count % 2) == 0:
            human_message = self.wrap_human(message)
            if self.turn_count != 0:
                human_message = "\n" + human_message
            wrapped = human_message
        else:
            wrapped = self.wrap_gpt(message)
        self.prompt += wrapped
        self.turn_count += 1
        return wrapped

    def get_potential_prompt(self, message: str) -> str:
        return (self.prompt + self.wrap_human(message)).removeprefix(self.bos)

    def get_prompt(self) -> str:
        return self.prompt.removeprefix(self.bos)
