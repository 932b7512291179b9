"""LLM text-generation provider surface (reference pkg/llm — dead code
there, ported thinly; see mie_spark/llm.py scope note), exercised
against a mocked transport like test_embedding_providers.py, plus the
Spark-side annotate_corpus batch operator with the deterministic mock.
"""

from __future__ import annotations

import pytest

import mie_spark.llm as L
from mie_spark.llm import (
    AnthropicLLMProvider,
    CodePrompt,
    Message,
    MockLLMProvider,
    OllamaLLMProvider,
    OpenAILLMProvider,
    SYSTEM_PROMPTS,
    annotate_corpus,
    build_chat_messages,
    default_provider,
    new_provider,
    quick_chat,
    quick_generate,
)


class _FakeHTTP:
    def __init__(self, responses):
        self.responses = list(responses)
        self.calls = []

    def __call__(self, url, payload, headers, method="POST"):
        self.calls.append((url, payload, headers, method))
        r = self.responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r


@pytest.fixture
def no_sleep(monkeypatch):
    monkeypatch.setattr(L.time, "sleep", lambda _: None)


@pytest.fixture
def clean_env(monkeypatch):
    for v in (
        "OLLAMA_HOST",
        "OLLAMA_BASE_URL",
        "OLLAMA_MODEL",
        "OPENAI_API_KEY",
        "OPENAI_BASE_URL",
        "OPENAI_MODEL",
        "ANTHROPIC_API_KEY",
        "ANTHROPIC_MODEL",
        "LLM_PROVIDER",
    ):
        monkeypatch.delenv(v, raising=False)


def test_mock_is_deterministic_and_overridable(clean_env):
    p = MockLLMProvider()
    r = p.generate("explain spark shuffles please, at length " * 3)
    assert r.text.startswith("[mock] Generated response for: ")
    assert r.done and r.model == "mock-model"
    assert r.total_tokens == r.prompt_tokens + 20
    c = p.chat([Message("user", "hi")])
    assert c.message.role == "assistant"
    p2 = MockLLMProvider(
        generate_fn=lambda prompt, **kw: L.GenerateResponse("X", "m")
    )
    assert p2.generate("anything").text == "X"


def test_new_provider_dispatch_and_unknown(clean_env):
    assert new_provider("mock").name() == "mock"
    assert new_provider("ollama").name() == "ollama"
    assert new_provider("local").name() == "ollama"
    assert new_provider("openai-compatible").name() == "openai"
    assert new_provider("claude", api_key="k").name() == "anthropic"
    with pytest.raises(ValueError, match="unknown LLM provider"):
        new_provider("bard")


def test_default_provider_precedence(clean_env, monkeypatch):
    assert default_provider().name() == "mock"
    monkeypatch.setenv("ANTHROPIC_API_KEY", "k")
    assert default_provider().name() == "anthropic"
    monkeypatch.setenv("OPENAI_API_KEY", "k")
    assert default_provider().name() == "openai"
    monkeypatch.setenv("OLLAMA_MODEL", "m")
    assert default_provider().name() == "ollama"
    monkeypatch.setenv("LLM_PROVIDER", "mock")
    assert L.provider_from_env().name() == "mock"


def test_ollama_requires_model(clean_env):
    with pytest.raises(ValueError, match="model not specified"):
        OllamaLLMProvider().generate("hi")


def test_ollama_request_shaping_and_parse(clean_env, monkeypatch, no_sleep):
    fake = _FakeHTTP(
        [
            {
                "response": "out",
                "model": "m1",
                "done": True,
                "prompt_eval_count": 7,
                "eval_count": 3,
            }
        ]
    )
    monkeypatch.setattr(L, "_http_json", fake)
    p = OllamaLLMProvider(base_url="http://h:1/", model="m1")
    r = p.generate("prompt", max_tokens=9, temperature=0.5)
    url, payload, _, method = fake.calls[0]
    assert url == "http://h:1/api/generate" and method == "POST"
    assert payload["stream"] is False
    assert payload["options"] == {"num_predict": 9, "temperature": 0.5}
    assert (r.text, r.model, r.prompt_tokens, r.output_tokens) == (
        "out",
        "m1",
        7,
        3,
    )
    assert r.total_tokens == 10


def test_ollama_chat_and_models(clean_env, monkeypatch, no_sleep):
    fake = _FakeHTTP(
        [
            {"message": {"role": "assistant", "content": "yo"}, "model": "m"},
            {"models": [{"name": "a"}, {"name": "b"}]},
        ]
    )
    monkeypatch.setattr(L, "_http_json", fake)
    p = OllamaLLMProvider(base_url="http://h:1", model="m")
    c = p.chat([Message("user", "hi")])
    assert c.message.content == "yo"
    assert fake.calls[0][0].endswith("/api/chat")
    assert p.models() == ["a", "b"]
    assert fake.calls[1][3] == "GET"


def test_ollama_retries_transient_failures(clean_env, monkeypatch, no_sleep):
    fake = _FakeHTTP(
        [OSError("boom"), {"response": "ok", "model": "m", "done": True}]
    )
    monkeypatch.setattr(L, "_http_json", fake)
    assert (
        OllamaLLMProvider(base_url="http://h:1", model="m").generate("p").text
        == "ok"
    )
    assert len(fake.calls) == 2


def test_openai_generate_routes_through_chat(clean_env, monkeypatch, no_sleep):
    fake = _FakeHTTP(
        [
            {
                "choices": [
                    {
                        "message": {"role": "assistant", "content": "ans"},
                        "finish_reason": "stop",
                    }
                ],
                "model": "gpt-x",
                "usage": {
                    "prompt_tokens": 5,
                    "completion_tokens": 2,
                    "total_tokens": 7,
                },
            }
        ]
    )
    monkeypatch.setattr(L, "_http_json", fake)
    p = OpenAILLMProvider(api_key="sk", model="gpt-x")
    r = p.generate("q", max_tokens=4, stop=["END"])
    url, payload, headers, _ = fake.calls[0]
    assert url.endswith("/chat/completions")
    assert headers == {"Authorization": "Bearer sk"}
    assert payload["messages"] == [{"role": "user", "content": "q"}]
    assert payload["max_tokens"] == 4 and payload["stop"] == ["END"]
    assert r.text == "ans" and r.done and r.total_tokens == 7


def test_openai_no_choices_raises(clean_env, monkeypatch, no_sleep):
    monkeypatch.setattr(
        L, "_http_json", _FakeHTTP([{"choices": []}, {"choices": []}, {"choices": []}])
    )
    with pytest.raises(RuntimeError, match="no choices"):
        OpenAILLMProvider(api_key="k").chat([Message("user", "x")])


def test_anthropic_system_lift_stop_and_blocks(clean_env, monkeypatch, no_sleep):
    fake = _FakeHTTP(
        [
            {
                "content": [
                    {"type": "text", "text": "a"},
                    {"type": "tool_use", "id": "t"},
                    {"type": "text", "text": "b"},
                ],
                "model": "c3",
                "stop_reason": "end_turn",
                "usage": {"input_tokens": 4, "output_tokens": 6},
            }
        ]
    )
    monkeypatch.setattr(L, "_http_json", fake)
    p = AnthropicLLMProvider(api_key="ak", model="c3")
    c = p.chat(
        build_chat_messages("be terse", "hello"), stop=["\n\n"], temperature=0.2
    )
    url, payload, headers, _ = fake.calls[0]
    assert url.endswith("/messages")
    assert headers["x-api-key"] == "ak"
    assert headers["anthropic-version"] == "2023-06-01"
    assert payload["system"] == "be terse"
    assert all(m["role"] != "system" for m in payload["messages"])
    assert payload["max_tokens"] == 4096  # reference default when unset
    assert payload["stop_sequences"] == ["\n\n"]
    assert c.message.content == "ab"  # text blocks concatenate
    assert c.done and c.total_tokens == 10
    assert "claude-3-5-sonnet-20241022" in p.models()


def test_quick_helpers_use_mock_when_unconfigured(clean_env):
    assert quick_generate("ping").startswith("[mock]")
    assert quick_chat("u1", "a1", "u2").startswith("[mock] Response to: u2")


def test_code_prompt_build_and_system_prompts():
    s = CodePrompt(
        task="Review",
        language="python",
        code="x=1",
        context="ctx",
        constraints=["no deps"],
    ).build()
    assert "Task: Review" in s and "```python\nx=1\n```" in s
    assert "- no deps" in s and "Context:\nctx" in s
    assert set(SYSTEM_PROMPTS) == {
        "code_review",
        "code_explain",
        "code_refactor",
        "code_generate",
        "code_document",
        "code_debug",
        "code_test",
    }


def test_annotate_corpus_mapinpandas_mock(spark, clean_env):
    df = spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, None)], ["doc_id", "text"]
    )
    out = annotate_corpus(
        df, "text", prompt_template="Label: {text}", out_col="label"
    )
    assert out.schema.fieldNames() == ["doc_id", "text", "label"]
    rows = {r["doc_id"]: r["label"] for r in out.collect()}
    assert rows[1] == "[mock] Generated response for: Label: alpha doc..."
    assert rows[3] == "[mock] Generated response for: Label: ..."  # null-safe
