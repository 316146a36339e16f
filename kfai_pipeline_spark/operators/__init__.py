"""Engine operators that compose built-in DataFrame ops.

Every operator here is declarative-first: it builds a Catalyst plan out
of built-in functions (shuffle-aware, codegen-friendly) and drops to
Pandas UDFs only where semantics genuinely require Python (the text
chunker, multimodal decode stubs).
"""
