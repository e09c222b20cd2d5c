"""GBNF grammar engine + grammar-constrained decoding."""

import json

import numpy as np
import pytest

from gguf_tpu.engine import LLM, SamplerConfig
from gguf_tpu.engine.grammar import (Grammar, GrammarSampler, GrammarState,
                                     JSON_GBNF)
from gguf_tpu.gguf import GGMLType
from gguf_tpu.models import LlamaConfig, write_random_llama_gguf

CFG = LlamaConfig(vocab_size=512, dim=256, n_layers=1, n_heads=4,
                  n_kv_heads=2, ffn_dim=512, max_seq_len=64)


def _spm_metadata():
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(256)]
    words = ["▁", "y", "e", "s", "n", "o", "h", "l", "w", "r", "d",
             "▁yes", "▁no", "yes", "no", "{", "}", '"', ":", ",", " ",
             "a", "b", "1", "2", "0"]
    tokens += words
    tokens = (tokens + [f"<p{i}>" for i in range(512)])[:CFG.vocab_size]
    scores = np.zeros(CFG.vocab_size, np.float32)
    scores[259 + len(["▁", "y", "e", "s", "n", "o", "h", "l", "w", "r",
                      "d"]):259 + len(words)] = 2.0
    return {
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("g") / "g.gguf")
    write_random_llama_gguf(path, CFG, fmt=GGMLType.Q4_K, seed=3,
                            extra_metadata=_spm_metadata())
    return LLM(path, max_batch=2, max_seq=48)


# -------------------------------------------------- grammar engine unit ---


def test_json_grammar_accepts_and_rejects():
    g = Grammar(JSON_GBNF)
    good = ['{"a": 1}', '{"k": [1, 2.5e3, {"x": null}], "y": "s\\n"} ',
            '{}', '{"a": true, "b": false}']
    bad = ['[1]', 'x', '{"a" 1}', '{"a": 01}', '{,}', '{"a": }']
    for t in good:
        st = GrammarState(g)
        assert st.advance_text(t), t
        assert st.can_stop, t
    for t in bad:
        st = GrammarState(g)
        alive = st.advance_text(t)
        assert not (alive and st.can_stop), t


def test_grammar_repetition_and_alternates():
    g = Grammar('root ::= ("ab" | "c")+ "!" [0-9]*')
    ok = ["ab!", "cabc!", "c!123", "ababab!9"]
    for t in ok:
        st = GrammarState(g)
        assert st.advance_text(t) and st.can_stop, t
    st = GrammarState(g)
    assert st.advance_text("ab")
    assert not st.can_stop               # '!' still required
    st2 = GrammarState(g)
    assert not st2.advance_text("ba")


def test_grammar_char_class_negation_and_escapes():
    g = Grammar(r'root ::= [^x\n]+ "\n"')
    st = GrammarState(g)
    assert st.advance_text("abc\n") and st.can_stop
    st2 = GrammarState(g)
    assert not st2.advance_text("ax")


def test_grammar_parse_errors():
    from gguf_tpu.engine.grammar import GrammarParseError

    with pytest.raises(GrammarParseError):
        Grammar("root ::= undefined-rule-ref")
    with pytest.raises(GrammarParseError):
        Grammar('other ::= "x"')          # no root


# --------------------------------------------- constrained generation ---


def test_generate_grammar_choice(llm):
    """A two-word grammar forces the output to one of the words exactly,
    and generation stops at grammar completion."""
    out = llm.generate(["ignored prompt"], max_new_tokens=16,
                       sampler=SamplerConfig(temperature=0.0),
                       grammar='root ::= "yes" | "no"')[0]
    assert out.text in ("yes", "no"), out.text
    assert out.finished


def test_generate_grammar_sampled_still_valid(llm):
    """Temperature sampling stays inside the grammar (exact masked draw
    via the Gumbel walk)."""
    for seed in (0, 1, 2):
        out = llm.generate(["p"], max_new_tokens=20,
                           sampler=SamplerConfig(temperature=1.5),
                           seed=seed,
                           grammar='root ::= ("ab" | "cd")+ "!"')[0]
        body = out.text
        assert body.endswith("!") or len(out.token_ids) == 20, body
        st = GrammarState(Grammar('root ::= ("ab" | "cd")+ "!"'))
        assert st.advance_text(body), body


def test_generate_json_mode(llm):
    """JSON mode: the (random-weight) model is forced onto a valid JSON
    prefix; a completed output parses with json.loads."""
    out = llm.generate(["data:"], max_new_tokens=40,
                       sampler=SamplerConfig(temperature=0.0),
                       grammar=JSON_GBNF)[0]
    text = out.text
    assert text.startswith("{"), text
    st = GrammarState(Grammar(JSON_GBNF))
    assert st.advance_text(text), text    # always a valid JSON prefix
    if out.finished and st.can_stop:
        json.loads(text)


def test_grammar_batched_requests(llm):
    """Two constrained requests through the slot pool: each obeys its
    (shared) grammar independently."""
    outs = llm.generate(["ignored", [3, 7]], max_new_tokens=12,
                        sampler=SamplerConfig(temperature=0.0),
                        grammar='root ::= "yes" | "no"')
    for o in outs:
        assert o.text in ("yes", "no"), o.text


def test_grammar_multiline_official_layout():
    """Official llama.cpp grammar files spread rules over indented lines
    (json.gbnf's layout) and use epsilon-recursive ws — both must parse
    and match."""
    g = Grammar('''
root   ::= object
value  ::= object | array | string | number | boolean | null
object ::=
  "{" ws (
            string ":" ws value
    ("," ws string ":" ws value)*
  )? "}" ws
array  ::=
  "[" ws ( value ("," ws value)* )? "]" ws
string ::=
  "\\"" ( [^"\\\\] | "\\\\" (["\\\\/bfnrt]) )* "\\"" ws
number ::= ("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ws
boolean ::= ("true" | "false") ws
null ::= "null" ws
ws ::= ([ \\t\\n] ws)?
''')
    st = GrammarState(g)
    assert st.advance_text('{"k": [1, true, null, "s"]}') and st.can_stop
    st2 = GrammarState(g)
    assert not st2.advance_text('[1]')


def test_grammar_byte_fallback_multibyte():
    """Non-ASCII literals assemble from byte-fallback tokens: the sampler
    must accept a valid UTF-8 lead byte (pending tail), reject stray
    continuation bytes, and complete the codepoint next step."""

    class ByteTok:
        add_space_prefix = False
        def decode_token(self, tid):
            return bytes([tid])

    gs = GrammarSampler.__new__(GrammarSampler)
    gs.grammar = Grammar('root ::= "é!"')
    gs.state = GrammarState(gs.grammar)
    gs.tok = ByteTok()
    gs.eos_id = 999
    gs._piece_cache = {}
    gs._pending = b""
    gs._first = True

    logits = np.zeros(256, np.float32)
    logits[0xA9] = 9.0    # stray continuation byte: must be rejected
    logits[0x21] = 8.0    # '!': grammar wants 'é' first
    logits[0xC3] = 7.0    # the lead byte of é — the only legal pick
    tid = gs.pick(logits)
    assert tid == 0xC3, hex(tid)
    gs.advance(tid)
    assert gs._pending == b"\xc3"
    logits2 = np.zeros(256, np.float32)
    logits2[0xA9] = 1.0
    tid2 = gs.pick(logits2)
    assert tid2 == 0xA9
    gs.advance(tid2)
    assert gs._pending == b"" and gs.state.advance_text("!")
