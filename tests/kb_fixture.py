"""Seeded knowledge base for the fixture corpus (the de-facto golden query
set, /root/reference/example_requests.json). Heuristic shapes chosen to
exercise every applicator: ANCHOR right/below (column+row), ZONE (with and
without regex), ANCHOR_EMPTY, multi_line, regex filters."""

OAB_KB = [
    # nome: top-left zone (device space, page 1056x552 → top band)
    {"label": "carteira_oab", "field": "nome", "type": "ZONE",
     "zone": [0.0, 0.0, 700.0, 45.0], "confidence": 0.7,
     "metadata": {}, "template_fixo": True},
    {"label": "carteira_oab", "field": "inscricao", "type": "ANCHOR",
     "zone": None, "confidence": 0.9,
     "metadata": {"anchor_text": "Inscrição", "direction": "below",
                  "layout": "column", "regex": r"\d+"},
     "template_fixo": True},
    {"label": "carteira_oab", "field": "seccional", "type": "ANCHOR",
     "zone": None, "confidence": 0.9,
     "metadata": {"anchor_text": "Seccional", "direction": "below",
                  "layout": "column"},
     "template_fixo": True},
    {"label": "carteira_oab", "field": "subsecao", "type": "ANCHOR",
     "zone": None, "confidence": 0.9,
     "metadata": {"anchor_text": "Subseção", "direction": "below",
                  "layout": "column"},
     "template_fixo": True},
    # situacao: the word SITUAÇÃO anchors its own value to the right
    {"label": "carteira_oab", "field": "situacao", "type": "ANCHOR",
     "zone": None, "confidence": 0.9,
     "metadata": {"anchor_text": "situacao", "direction": "right"},
     "template_fixo": True},
    # telefone: label present, value absent → ANCHOR_EMPTY confirms null
    {"label": "carteira_oab", "field": "telefone_profissional",
     "type": "ANCHOR_EMPTY", "zone": None, "confidence": 0.8,
     "metadata": {"anchor_text": "Telefone Profissional",
                  "direction": "below", "layout": "column"},
     "template_fixo": True},
    # endereco: multi-line below
    {"label": "carteira_oab", "field": "endereco_profissional",
     "type": "ANCHOR", "zone": None, "confidence": 0.85,
     "metadata": {"anchor_text": "Endereço Profissional",
                  "direction": "below", "layout": "column",
                  "multi_line": "true"},
     "template_fixo": True},
]

TELA_KB = [
    {"label": "tela_sistema", "field": "data_base", "type": "ANCHOR",
     "zone": None, "confidence": 0.9,
     "metadata": {"anchor_text": "Data Base", "direction": "below",
                  "layout": "column", "regex": r"\d{2}/\d{2}/\d{4}"},
     "template_fixo": True},
    {"label": "tela_sistema", "field": "quantidade_parcelas", "type": "ANCHOR",
     "zone": None, "confidence": 0.9,
     "metadata": {"anchor_text": "Qtd. Parcelas", "direction": "below",
                  "layout": "column", "regex": r"\d+"},
     "template_fixo": True},
    {"label": "tela_sistema", "field": "sistema", "type": "ANCHOR",
     "zone": None, "confidence": 0.9,
     "metadata": {"anchor_text": "Sistema", "direction": "below",
                  "layout": "column"},
     "template_fixo": True},
    {"label": "tela_sistema", "field": "data_referencia", "type": "ANCHOR",
     "zone": None, "confidence": 0.9,
     "metadata": {"anchor_text": "Data Referência:", "direction": "right",
                  "regex": r"\d{2}/\d{2}/\d{4}"},
     "template_fixo": True},
    # "Total:" as an anchor collides with the earlier "Total Geral" header
    # (first-occurrence index semantics, extractor.py:170) — the reference
    # would fail this field to the LLM; a bottom-strip ZONE is deterministic.
    {"label": "tela_sistema", "field": "total_de_parcelas", "type": "ZONE",
     "zone": [5.0, 565.0, 500.0, 589.0], "confidence": 0.7,
     "metadata": {"regex": r"[\d\.,]+"}, "template_fixo": True},
]

FIXTURE_KB = OAB_KB + TELA_KB
