"""Interactive QA frontends (reference stages 6-7): a CLI REPL and an
optional Gradio adapter over the RAG plan.

Twin of ref src/kfai/loaders/interactive_qa.py:7-36 (the input loop:
banner, strip, skip empty, 'exit' quits) and gradio_app.py:8-64 (a
ChatInterface whose callback returns the rendered response string);
both drive the same agent entry point, here
:meth:`QueryAgentSession.process_query` over
``plans.rag.answer_query``. The LLM boundaries (parser U5, embedder
U2, synthesizer U6) stay INJECTED callables exactly as in the batch
plan — the frontends add no new data motion, so there is nothing
Spark-shaped to re-architect: retrieval still runs the filtered-scan +
score + dedup/cap/re-sort plan, one job per question.

Rendering mirrors the reference's console block
(query_agent.py:195-221): an ``Answer:`` section, then per-video
``Video/Link/Image/Referenced at`` source groups ordered by publish
date, with the no-citation fallback line.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from kfai_pipeline_spark.plans.rag import (
    CONTEXT_COUNT,
    Citation,
    ParsedQuery,
    answer_query,
)

EXIT_COMMAND = "exit"  # ref interactive_qa.py:31
BANNER = "\n--- Ask a question, or type 'exit' to quit. ---"
NO_SOURCES_LINE = "  - No direct sources cited in the response."
NO_DOCS_GUI_MSG = (
    "I could not find any relevant documents to answer your question. "
    "Please try rephrasing."
)  # ref query_agent.py:365-369


def default_parser(question: str) -> ParsedQuery:
    """Stub U5 boundary: no extracted terms — retrieval scores the whole
    store against the question embedding. Production injects an LLM
    parser emitting shows/hosts/topics/year terms."""
    return ParsedQuery()


def default_synthesizer(
    question: str, context_rows: list[dict]
) -> tuple[str, list[Citation]]:
    """Stub U6 boundary: deterministic extractive 'answer' — echo the
    first context chunk and cite it. Production injects an LLM that
    writes prose and emits (video_id, start_time) citations."""
    if not context_rows:
        return "No relevant context found.", []
    first = context_rows[0]
    answer = (
        f"[stub] Top context for {question!r} is from "
        f"{first.get('title', first['video_id'])!r}: {first.get('text', '')[:200]}"
    )
    return answer, [Citation(first["video_id"], first["start_time"])]


def render_sources(source_rows: list[dict]) -> str:
    """``cite()`` rows -> the reference's console source block
    (query_agent.py:195-221): ruled per-video groups, publish-date
    order (already cite()'s ORDER BY), comma-joined formatted times."""
    lines = ["", "Sources:"]
    if not source_rows:
        lines.append(NO_SOURCES_LINE)
        return "\n".join(lines)
    for row in source_rows:
        vid = row["video_id"]
        lines.append("")
        lines.append("=" * 50)
        lines.append(f"  Video: {row['title']}")
        lines.append(f"  Link:  https://www.youtube.com/watch?v={vid}")
        lines.append(f"  Image: https://i.ytimg.com/vi/{vid}/mqdefault.jpg")
        lines.append("  Referenced at: " + ", ".join(row["formatted"]))
    lines.append("")
    lines.append("=" * 50)
    return "\n".join(lines)


class QueryAgentSession:
    """Driver-side twin of the reference's QueryAgent (stages 6-7 entry
    point): binds the chunk store and the three injected LLM boundaries
    once, then answers questions until the caller stops."""

    def __init__(
        self,
        docs: DataFrame,
        parser: Callable[[str], ParsedQuery] = default_parser,
        embedder: Callable[[list[str]], list[list[float]]] | None = None,
        synthesizer: Callable[
            [str, list[dict]], tuple[str, list[Citation]]
        ] = default_synthesizer,
        k: int = CONTEXT_COUNT,
    ) -> None:
        if embedder is None:
            from kfai_pipeline_spark.operators.embed import hash_embed

            embedder = hash_embed
        self.docs = docs
        self.parser = parser
        self.embedder = embedder
        self.synthesizer = synthesizer
        self.k = k

    def process_query(self, question: str, is_gui: bool = False) -> str | None:
        """One question through the full RAG lifecycle; returns the
        rendered response (answer + source block). GUI mode returns the
        no-docs fallback message instead of None, like ref
        query_agent.py:363-374."""
        n_context = 0

        def counting_synth(q: str, rows: list[dict]):
            nonlocal n_context
            n_context = len(rows)
            return self.synthesizer(q, rows)

        answer, sources = answer_query(
            self.docs,
            question,
            self.parser,
            self.embedder,
            counting_synth,
            k=self.k,
        )
        # no retrieved docs: GUI gets the fallback message, CLI gets
        # None (caller prints the warning) — ref query_agent.py:363-374
        if n_context == 0:
            return NO_DOCS_GUI_MSG if is_gui else None
        source_rows = [r.asDict() for r in sources.collect()]
        return f"Answer:\n{answer}" + render_sources(source_rows)


def run_repl(
    session: QueryAgentSession,
    input_fn: Callable[[str], str] = input,
    output_fn: Callable[[str], None] = print,
) -> int:
    """Stage 6: the reference's CLI loop (interactive_qa.py:22-36) with
    injectable I/O so tests can script a session. Returns the number of
    questions answered."""
    answered = 0
    while True:
        output_fn(BANNER)
        try:
            user_query = input_fn("\n> ")
        except (EOFError, KeyboardInterrupt):
            output_fn("\nExiting...")
            break
        user_query = user_query.strip()
        if not user_query:
            continue
        if user_query.lower() == EXIT_COMMAND:
            output_fn("\nExiting...")
            break
        response = session.process_query(user_query)
        if response is None:
            output_fn("  !!  WARNING: No documents found, skipping this question...")
            continue
        output_fn(response)
        answered += 1
    return answered


def build_gradio_app(session: QueryAgentSession):
    """Stage 7/8: the reference's ChatInterface (gradio_app.py:30-61)
    over the same session. Returns the unlaunched app so callers (and
    tests) control ``launch``; raises with the missing optional
    dependency's name when gradio isn't installed."""
    try:
        import gradio as gr
    except ImportError as exc:  # gradio is not in the engine's base deps
        raise NotImplementedError(
            "interactive GUI requires the optional dependency 'gradio' "
            "(pip install gradio); the CLI REPL (run_repl) has no extra deps"
        ) from exc

    def chat_with_agent(message: str, history) -> str:
        response = session.process_query(message, is_gui=True)
        assert response is not None
        return response

    return gr.ChatInterface(
        fn=chat_with_agent,
        title="kfai-pipeline-spark",
        description="Ask a question about the loaded chunk store.",
        cache_examples=False,
    )


def run_gradio(session: QueryAgentSession) -> None:
    """Launch the GUI (blocking), matching ref gradio_app.py:64."""
    build_gradio_app(session).launch(share=False)
