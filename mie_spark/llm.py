"""LLM text-generation providers (reference: pkg/llm/provider.go:19-31).

Scope note (VERDICT r5 item #8): pkg/llm is DEAD CODE in the reference
— zero imports from cmd/ or any other pkg — but the surface is part of
its public API, so it is ported thinly here: the Provider interface
(generate / chat / name / models), the four provider types
(ollama / openai / anthropic / mock), env-driven construction, and the
prompt-building helpers (pkg/llm/helpers.go). Structure mirrors
mie_spark/embedding.py (same retry/_http_json transport, same
mocked-HTTP test strategy) rather than the Go shapes.

What the reference does NOT have but a Spark engine should:
``annotate_corpus`` runs a provider over a DataFrame column via
mapInPandas — the LLM-labeling step of a training-data pipeline
(quality judgments, rewrites, synthetic captions). Real HTTP providers
need network; the deterministic mock runs everywhere, so the Spark
plumbing (schema, batching, worker-side closure) is fully tested while
the network path stays behind env vars — the same policy as
embedding.py and the multimodal codecs.
"""

from __future__ import annotations

import json
import os
import random
import time
import urllib.request
from dataclasses import dataclass, field

# Public Anthropic REST API version header, identical to the one the
# reference sends (pkg/llm/provider.go:157) — a documented public API
# constant, not an internal identifier.
_ANTHROPIC_API_VERSION = "2023-06-01"

_DEF_ANTHROPIC_MODELS = [
    # pkg/llm/provider.go:626-634 — Anthropic has no public models
    # endpoint; the reference returns a static list.
    "claude-3-5-sonnet-20241022",
    "claude-3-5-haiku-20241022",
    "claude-3-opus-20240229",
    "claude-3-sonnet-20240229",
    "claude-3-haiku-20240307",
]


@dataclass
class Message:
    """Chat message (provider.go Message): role is 'system' | 'user' |
    'assistant'."""

    role: str
    content: str


@dataclass
class GenerateResponse:
    """Completion + usage accounting (provider.go GenerateResponse).
    duration_s replaces Go's time.Duration."""

    text: str
    model: str
    prompt_tokens: int = 0
    output_tokens: int = 0
    duration_s: float = 0.0
    done: bool = True

    @property
    def total_tokens(self) -> int:
        return self.prompt_tokens + self.output_tokens


@dataclass
class ChatResponse:
    message: Message = field(
        default_factory=lambda: Message("assistant", "")
    )
    model: str = ""
    prompt_tokens: int = 0
    output_tokens: int = 0
    duration_s: float = 0.0
    done: bool = True

    @property
    def total_tokens(self) -> int:
        return self.prompt_tokens + self.output_tokens


def _retry(fn, attempts: int = 3, base_delay: float = 0.5):
    """Exponential backoff with jitter — same policy as
    embedding._retry (reference embedding.go:74-100; pkg/llm carries
    MaxRetries in its config the same way)."""
    last: Exception | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — provider errors are opaque
            last = exc
            if attempt < attempts - 1:
                time.sleep(base_delay * (2**attempt) * (1 + random.random() * 0.25))
    raise last  # type: ignore[misc]


def _http_json(
    url: str,
    payload: dict | None,
    headers: dict[str, str],
    method: str = "POST",
) -> dict:
    req = urllib.request.Request(
        url,
        data=None if payload is None else json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method=method,
    )
    with urllib.request.urlopen(req, timeout=120) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def _gen_kwargs(
    max_tokens: int, temperature: float, top_p: float, stop: list[str] | None
) -> dict:
    """Normalized optional-sampling params (zero = provider default,
    matching the Go zero-value semantics)."""
    out: dict = {}
    if max_tokens > 0:
        out["max_tokens"] = max_tokens
    if temperature > 0:
        out["temperature"] = temperature
    if top_p > 0:
        out["top_p"] = top_p
    if stop:
        out["stop"] = list(stop)
    return out


@dataclass
class MockLLMProvider:
    """Deterministic test provider (provider.go MockProvider:
    predictable responses, override hooks for tests)."""

    model: str = "mock-model"
    generate_fn: object = None  # optional override, like Go's GenerateFunc
    chat_fn: object = None

    def name(self) -> str:
        return "mock"

    def models(self) -> list[str]:
        return ["mock-model"]

    def generate(self, prompt: str, model: str = "", **kw) -> GenerateResponse:
        if self.generate_fn is not None:
            return self.generate_fn(prompt, model=model, **kw)
        return GenerateResponse(
            text=f"[mock] Generated response for: {prompt[:50]}...",
            model=self.model or "mock-model",
            prompt_tokens=len(prompt) // 4,
            output_tokens=20,
        )

    def chat(self, messages: list[Message], model: str = "", **kw) -> ChatResponse:
        if self.chat_fn is not None:
            return self.chat_fn(messages, model=model, **kw)
        last = messages[-1].content if messages else ""
        return ChatResponse(
            message=Message("assistant", f"[mock] Response to: {last[:50]}..."),
            model=self.model or "mock-model",
            prompt_tokens=50,
            output_tokens=20,
        )


@dataclass
class OllamaLLMProvider:
    """Local Ollama server (provider.go:170-390): /api/generate,
    /api/chat, /api/tags; sampling params ride in `options`."""

    base_url: str = ""
    model: str = ""
    attempts: int = 3

    def __post_init__(self) -> None:
        self.base_url = (
            self.base_url
            or os.environ.get("OLLAMA_HOST", "")
            or os.environ.get("OLLAMA_BASE_URL", "")
            or "http://localhost:11434"
        ).rstrip("/")
        self.model = self.model or os.environ.get("OLLAMA_MODEL", "")

    def name(self) -> str:
        return "ollama"

    def models(self) -> list[str]:
        out = _retry(
            lambda: _http_json(
                f"{self.base_url}/api/tags", None, {}, method="GET"
            ),
            self.attempts,
        )
        return [m["name"] for m in out.get("models", [])]

    def _model(self, model: str) -> str:
        got = model or self.model
        if not got:
            raise ValueError(
                "ollama: model not specified (set OLLAMA_MODEL or pass model=)"
            )
        return got

    def _options(self, kw: dict) -> dict:
        # all four sampling params generate()/chat() accept are forwarded
        # (Ollama nests them under "options"); dropping top_p/stop here
        # would make sampling silently differ from the other providers
        opts = {}
        if kw.get("max_tokens"):
            opts["num_predict"] = kw["max_tokens"]
        if kw.get("temperature"):
            opts["temperature"] = kw["temperature"]
        if kw.get("top_p"):
            opts["top_p"] = kw["top_p"]
        if kw.get("stop"):
            opts["stop"] = kw["stop"]
        return {"options": opts} if opts else {}

    def generate(self, prompt: str, model: str = "", **kw) -> GenerateResponse:
        payload = {
            "model": self._model(model),
            "prompt": prompt,
            "stream": False,
            **self._options(_gen_kwargs(**_norm(kw))),
        }
        t0 = time.monotonic()
        out = _retry(
            lambda: _http_json(f"{self.base_url}/api/generate", payload, {}),
            self.attempts,
        )
        return GenerateResponse(
            text=out.get("response", ""),
            model=out.get("model", payload["model"]),
            prompt_tokens=out.get("prompt_eval_count", 0),
            output_tokens=out.get("eval_count", 0),
            duration_s=time.monotonic() - t0,
            done=bool(out.get("done", True)),
        )

    def chat(self, messages: list[Message], model: str = "", **kw) -> ChatResponse:
        payload = {
            "model": self._model(model),
            "messages": [{"role": m.role, "content": m.content} for m in messages],
            "stream": False,
            **self._options(_gen_kwargs(**_norm(kw))),
        }
        t0 = time.monotonic()
        out = _retry(
            lambda: _http_json(f"{self.base_url}/api/chat", payload, {}),
            self.attempts,
        )
        msg = out.get("message", {})
        return ChatResponse(
            message=Message(msg.get("role", "assistant"), msg.get("content", "")),
            model=out.get("model", payload["model"]),
            prompt_tokens=out.get("prompt_eval_count", 0),
            output_tokens=out.get("eval_count", 0),
            duration_s=time.monotonic() - t0,
            done=bool(out.get("done", True)),
        )


@dataclass
class OpenAILLMProvider:
    """OpenAI-compatible /chat/completions (provider.go:392-581);
    generate() routes through chat, as the reference does."""

    base_url: str = ""
    api_key: str = ""
    model: str = ""
    attempts: int = 3

    def __post_init__(self) -> None:
        self.base_url = (
            self.base_url
            or os.environ.get("OPENAI_BASE_URL", "")
            or "https://api.openai.com/v1"
        ).rstrip("/")
        self.api_key = self.api_key or os.environ.get("OPENAI_API_KEY", "")
        self.model = (
            self.model or os.environ.get("OPENAI_MODEL", "") or "gpt-4o-mini"
        )

    def name(self) -> str:
        return "openai"

    def _headers(self) -> dict[str, str]:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}

    def models(self) -> list[str]:
        out = _retry(
            lambda: _http_json(
                f"{self.base_url}/models", None, self._headers(), method="GET"
            ),
            self.attempts,
        )
        return [m["id"] for m in out.get("data", [])]

    def generate(self, prompt: str, model: str = "", **kw) -> GenerateResponse:
        c = self.chat([Message("user", prompt)], model=model, **kw)
        return GenerateResponse(
            text=c.message.content,
            model=c.model,
            prompt_tokens=c.prompt_tokens,
            output_tokens=c.output_tokens,
            duration_s=c.duration_s,
            done=c.done,
        )

    def chat(self, messages: list[Message], model: str = "", **kw) -> ChatResponse:
        payload = {
            "model": model or self.model,
            "messages": [{"role": m.role, "content": m.content} for m in messages],
            **_gen_kwargs(**_norm(kw)),
        }
        t0 = time.monotonic()
        out = _retry(
            lambda: _http_json(
                f"{self.base_url}/chat/completions", payload, self._headers()
            ),
            self.attempts,
        )
        choices = out.get("choices") or []
        if not choices:
            raise RuntimeError("openai returned no choices")
        usage = out.get("usage", {})
        return ChatResponse(
            message=Message(
                choices[0]["message"].get("role", "assistant"),
                choices[0]["message"].get("content", ""),
            ),
            model=out.get("model", payload["model"]),
            prompt_tokens=usage.get("prompt_tokens", 0),
            output_tokens=usage.get("completion_tokens", 0),
            duration_s=time.monotonic() - t0,
            done=choices[0].get("finish_reason") == "stop",
        )


@dataclass
class AnthropicLLMProvider:
    """Anthropic /v1/messages (provider.go:583-760): system messages
    lift into the top-level `system` field, stop → stop_sequences,
    max_tokens is REQUIRED (defaults 4096), text blocks concatenate."""

    base_url: str = "https://api.anthropic.com/v1"
    api_key: str = ""
    model: str = ""
    attempts: int = 3

    def __post_init__(self) -> None:
        self.base_url = self.base_url.rstrip("/")
        self.api_key = self.api_key or os.environ.get("ANTHROPIC_API_KEY", "")
        self.model = (
            self.model
            or os.environ.get("ANTHROPIC_MODEL", "")
            or "claude-3-5-sonnet-20241022"
        )

    def name(self) -> str:
        return "anthropic"

    def models(self) -> list[str]:
        return list(_DEF_ANTHROPIC_MODELS)

    def generate(self, prompt: str, model: str = "", **kw) -> GenerateResponse:
        c = self.chat([Message("user", prompt)], model=model, **kw)
        return GenerateResponse(
            text=c.message.content,
            model=c.model,
            prompt_tokens=c.prompt_tokens,
            output_tokens=c.output_tokens,
            duration_s=c.duration_s,
            done=c.done,
        )

    def chat(self, messages: list[Message], model: str = "", **kw) -> ChatResponse:
        params = _gen_kwargs(**_norm(kw))
        system = "".join(m.content for m in messages if m.role == "system")
        payload = {
            "model": model or self.model,
            "messages": [
                {"role": m.role, "content": m.content}
                for m in messages
                if m.role != "system"
            ],
            "max_tokens": params.pop("max_tokens", 4096),
        }
        if system:
            payload["system"] = system
        if "stop" in params:
            payload["stop_sequences"] = params.pop("stop")
        payload.update(params)
        headers = {
            "x-api-key": self.api_key,
            "anthropic-version": _ANTHROPIC_API_VERSION,
        }
        t0 = time.monotonic()
        out = _retry(
            lambda: _http_json(f"{self.base_url}/messages", payload, headers),
            self.attempts,
        )
        text = "".join(
            c.get("text", "") for c in out.get("content", []) if c.get("type") == "text"
        )
        usage = out.get("usage", {})
        return ChatResponse(
            message=Message("assistant", text),
            model=out.get("model", payload["model"]),
            prompt_tokens=usage.get("input_tokens", 0),
            output_tokens=usage.get("output_tokens", 0),
            duration_s=time.monotonic() - t0,
            done=out.get("stop_reason") == "end_turn",
        )


def _norm(kw: dict) -> dict:
    """Fill the _gen_kwargs signature from loose **kw."""
    return {
        "max_tokens": kw.get("max_tokens", 0),
        "temperature": kw.get("temperature", 0.0),
        "top_p": kw.get("top_p", 0.0),
        "stop": kw.get("stop"),
    }


def new_provider(kind: str, **kw):
    """Factory (provider.go NewProvider): ollama | openai | anthropic |
    mock, with the reference's aliases."""
    k = (kind or "").lower()
    if k in ("ollama", "local", ""):
        return OllamaLLMProvider(**kw)
    if k in ("openai", "openai-compatible"):
        return OpenAILLMProvider(**kw)
    if k in ("anthropic", "claude"):
        return AnthropicLLMProvider(**kw)
    if k in ("mock", "test"):
        return MockLLMProvider(**kw)
    raise ValueError(
        f"unknown LLM provider type: {kind} "
        "(supported: ollama, openai, anthropic, mock)"
    )


def default_provider():
    """Env-driven pick, same precedence as helpers.go DefaultProvider:
    Ollama (local, free) → OpenAI → Anthropic → mock."""
    if any(
        os.environ.get(v)
        for v in ("OLLAMA_HOST", "OLLAMA_BASE_URL", "OLLAMA_MODEL")
    ):
        return new_provider("ollama")
    if os.environ.get("OPENAI_API_KEY"):
        return new_provider("openai")
    if os.environ.get("ANTHROPIC_API_KEY"):
        return new_provider("anthropic")
    return new_provider("mock")


def provider_from_env(env_var: str = "LLM_PROVIDER"):
    """helpers.go ProviderFromEnv: explicit type wins, else default."""
    kind = os.environ.get(env_var, "")
    return new_provider(kind) if kind else default_provider()


def quick_generate(prompt: str) -> str:
    return default_provider().generate(prompt).text


def quick_chat(*turns: str) -> str:
    """Alternating user/assistant turns (helpers.go QuickChat)."""
    msgs = [
        Message("user" if i % 2 == 0 else "assistant", t)
        for i, t in enumerate(turns)
    ]
    return default_provider().chat(msgs).message.content


def build_chat_messages(
    system_prompt: str, user_prompt: str, *history: Message
) -> list[Message]:
    """helpers.go BuildChatMessages: system first, then history, then
    the new user turn."""
    return [Message("system", system_prompt), *history, Message("user", user_prompt)]


@dataclass
class CodePrompt:
    """Structured code-task prompt builder (helpers.go CodePrompt)."""

    task: str
    language: str = ""
    code: str = ""
    context: str = ""
    constraints: list[str] = field(default_factory=list)

    def build(self) -> str:
        parts = [f"Task: {self.task}\n"]
        if self.language:
            parts.append(f"Language: {self.language}\n")
        if self.context:
            parts.append(f"Context:\n{self.context}\n")
        if self.code:
            parts.append(f"Code:\n```{self.language}\n{self.code}\n```\n")
        if self.constraints:
            parts.append(
                "Constraints:\n"
                + "\n".join(f"- {c}" for c in self.constraints)
                + "\n"
            )
        return "\n".join(parts)


# helpers.go SystemPrompts — same task keys, original (shorter) wording.
SYSTEM_PROMPTS: dict[str, str] = {
    "code_review": (
        "You are a code reviewer. Report bugs, security issues, "
        "performance problems, and style concerns with line numbers."
    ),
    "code_explain": (
        "You are a programming tutor. Explain the code step by step, "
        "naming the patterns and techniques it uses."
    ),
    "code_refactor": (
        "You are a refactoring specialist. Improve clarity and "
        "performance without changing behavior; show before and after."
    ),
    "code_generate": (
        "You are an expert programmer. Produce production-quality code "
        "with clear names, error handling, and types."
    ),
    "code_document": (
        "You are a technical writer. Document parameters, returns, "
        "usage examples, and edge cases."
    ),
    "code_debug": (
        "You are a debugger. Find the root cause of the error and "
        "propose a fix, reasoning step by step."
    ),
    "code_test": (
        "You are a QA engineer. Write unit tests covering normal, "
        "boundary, and error paths in the language's standard framework."
    ),
}


def annotate_corpus(
    df,
    text_col: str,
    prompt_template: str = "Summarize: {text}",
    out_col: str = "annotation",
    provider_kind: str = "mock",
    model: str = "",
    max_tokens: int = 0,
):
    """Run an LLM provider over a corpus column — the labeling /
    rewriting / synthetic-annotation step of a training-data pipeline.

    Spark-first shape: mapInPandas, one provider per PARTITION (HTTP
    connection reuse, never per row), Arrow-batched text in/out. The
    provider is constructed worker-side from (kind, model) — provider
    objects never pickle across the boundary, mirroring
    make_worker_embed's by-value closure policy. At 100 TB the
    bottleneck is the provider endpoint, not Spark: throughput scales
    with partitions × endpoint concurrency, and `repartition(n)`
    before this call is the rate knob.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        df.schema.fields + [StructField(out_col, StringType())]
    )
    kind, mdl, tmpl, tokens = provider_kind, model, prompt_template, max_tokens
    col = text_col
    out = out_col

    def run(batches):
        provider = new_provider(kind, **({"model": mdl} if mdl else {}))
        kw = {"max_tokens": tokens} if tokens else {}
        for pdf in batches:
            pdf[out] = [
                provider.generate(tmpl.format(text=t or ""), **kw).text
                for t in pdf[col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
