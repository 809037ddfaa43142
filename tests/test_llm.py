"""LLM interactor conversation engine (reference tools/llm_interactor.py
ported semantics): [INST] prompt assembly, NUM_PREV history window,
MAX_PROMPT_LENGTH drop loop, extract_response parsing — all exercised
against a scripted fake backend; plus the torch-generate path through
TransformersVLMBackend with an injected fake processor/model pair."""
import numpy as np

from cremage_tpu.app.llm import (
    LLMInteractor, MAX_PROMPT_LENGTH, NUM_PREV, TransformersVLMBackend,
    build_prompt, extract_response,
)


def test_extract_response_takes_last_inst_block():
    raw = ("[INST] hi  [/INST] first answer\n\n"
           "[INST] again  [/INST]   second answer  ")
    assert extract_response(raw) == "second answer"
    assert extract_response("no tags at all") == ""


def test_build_prompt_image_tag_and_window():
    prompt, used = build_prompt([], "describe", with_image=True)
    assert prompt == "[INST] <image>\ndescribe  [/INST]"
    hist = [f"[INST] q{i} [/INST] a{i}" for i in range(30)]
    prompt, used = build_prompt(hist, "new q", with_image=False)
    # only the last NUM_PREV turns ride along
    assert "q9" not in prompt and "q10" in prompt
    assert len(used) == NUM_PREV + 1
    assert prompt.endswith("[INST] new q  [/INST]")


def test_build_prompt_drops_oldest_when_too_long():
    hist = ["[INST] x [/INST] " + "y" * 900 for _ in range(6)]
    prompt, used = build_prompt(hist, "q", with_image=False)
    assert len(prompt) <= MAX_PROMPT_LENGTH
    assert used[-1] == "[INST] q  [/INST]"
    # single over-long turn truncates instead of emptying
    prompt, used = build_prompt([], "z" * (MAX_PROMPT_LENGTH + 100), False)
    assert len(prompt) <= MAX_PROMPT_LENGTH + 32


def test_interactor_chat_flow_and_history():
    seen = []

    def fake_backend(prompt, image01):
        seen.append((prompt, image01 is not None))
        return prompt + " MODEL SAYS " + str(len(seen))

    it = LLMInteractor(backend=fake_backend)
    img = np.zeros((8, 8, 3), np.float32)
    r1 = it.chat("what is this?", img)
    assert r1 == "MODEL SAYS 1"
    assert seen[0][1] is True and "<image>" in seen[0][0]
    r2 = it.chat("and now?")
    assert r2 == "MODEL SAYS 2"
    # second prompt carries the first raw turn
    assert "[INST] what is this? [/INST] MODEL SAYS 1" in seen[1][0]
    assert [c["speaker"] for c in it.content] == [
        "user", "agent", "user", "agent"]
    it.reset()
    assert not it.raw_history and not it.content


def test_transformers_backend_generate_path():
    """Drive TransformersVLMBackend with a fake processor/model that
    follow the transformers call contract (reference generate_caption)."""
    import torch

    class FakeProc:
        def __call__(self, text, images=None, return_tensors="pt"):
            ids = torch.arange(len(text.split()))[None]
            out = {"input_ids": ids}
            if images is not None:
                out["pixel_values"] = torch.zeros(1, 3, 4, 4)
            return out

        def batch_decode(self, ids, **kw):
            return ["[INST] q [/INST] decoded-reply"]

    class FakeModel:
        def generate(self, input_ids=None, pixel_values=None,
                     max_new_tokens=0):
            assert input_ids is not None
            return input_ids

    be = TransformersVLMBackend(FakeModel(), FakeProc(), max_new_tokens=8)
    it = LLMInteractor(backend=be)
    out = it.caption(np.zeros((8, 8, 3), np.float32))
    assert out == "decoded-reply"


def test_extract_response_reference_golden():
    """Exact case from the reference's llm_interactor_test.py."""
    expected = ("That's great! Dogs are wonderful companions. "
                "What kind of dog is Jean?")
    raw = ("\n[INST] I'm Tom. [/INST] Hello Tom! How can I help you today?"
           "\n\n[INST] I have a dog named Jean.  [/INST] " + expected)
    assert extract_response(raw) == expected
