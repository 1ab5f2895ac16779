"""Question/schema registry: the closed set of questions, type maps, and
qa_id expansion.

This is the engine's schema system (reference:
``features/questions/questions.py``, ``features/questions/type_map.py``,
``features/preprocess.py:100-235``).  A registry instance is a small,
picklable value broadcast to every task — the classic small-side
broadcast join (`ray.put` once or captured in the UDF closure; never a
shuffle).

A new document class = one ``register_project`` call with a questions
dict and a typename->type map (reference README.md:74-236 extension
surface).
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Union

COMPLEMENT = " e como aparece no texto?"  # questions.py:21
COMPLEMENT_TYPE = "aparece no texto"  # type_map.py:11

QuestionDict = Dict[str, Union[List[str], "OrderedDict[str, List[str]]"]]

# --- default 'form' project (reference questions.py:23-94, type_map.py:16-36)

_QUESTIONS_FORM: QuestionDict = {
    "etiqueta": ["Qual é o número da etiqueta?"],
    "agencia": ["Qual é o número da agência?"],
    "conta_corrente": ["Qual é o número da conta corrente?"],
    "cpf": ["Qual é o CPF/CNPJ?", "Qual é o CPF do titular?"],
    "nome_completo": ["Qual é o nome?", "Qual é o nome completo?"],
    "n_doc_serie": ["Qual é o número do documento ou número da série?"],
    "orgao_emissor": ["Qual é o órgão emissor?"],
    "doc_id_uf": [
        "Qual é o estado do documento de identificação?",
        "Qual é a UF do documento de identificação?",
    ],
    "data_emissao": ["Qual é a data de emissão?"],
    "data_nascimento": ["Qual é a data de nascimento?"],
    "nome_mae": ["Qual é o nome da mãe?"],
    "nome_pai": ["Qual é o nome do pai?"],
    "endereco": OrderedDict(
        {
            "compound": ["Qual o endereço?"],
            "logradouro": ["Qual é o logradouro?"],
            "numero": ["Qual é o número?"],
            "complemento": ["Qual é o complemento?"],
            "bairro": ["Qual é o bairro?"],
            "cidade": ["Qual é a cidade?"],
            "estado": ["Qual é o estado?"],
            "cep": ["Qual é o CEP?"],
        }
    ),
}

_FORM_TYPENAME_TO_TYPE = {
    "etiqueta": "Etiqueta",
    "agencia": "Agência",
    "conta_corrente": "Conta Corrente",
    "cpf": "CPF/CNPJ",
    "nome_completo": "Nome",
    "n_doc_serie": "No do Documento",
    "orgao_emissor": "Órgão Emissor",
    "data_emissao": "Data de Emissão",
    "data_nascimento": "Data de Nascimento",
    "nome_mae": "Nome da Mãe",
    "nome_pai": "Nome do Pai",
    "endereco": "Endereço",
    "logradouro": "Logradouro",
    "numero": "Número",
    "complemento": "Complemento",
    "bairro": "Bairro",
    "cidade": "Cidade",
    "estado": "Estado",
    "cep": "CEP",
}


@dataclass
class QuestionRegistry:
    """Broadcastable question/type registry.

    ``questions``: project -> typename -> list[question] or OrderedDict
    (compound signature; 'compound' key holds the compound questions —
    signature order is load-bearing, questions.py:63-88).
    """

    questions: Dict[str, QuestionDict] = field(default_factory=dict)
    typename_to_type: Dict[str, str] = field(default_factory=dict)

    def __post_init__(self):
        if COMPLEMENT_TYPE not in self.typename_to_type:
            # type_map.py:38-41
            self.typename_to_type = {
                COMPLEMENT_TYPE: COMPLEMENT_TYPE,
                **self.typename_to_type,
            }

    # -- construction ------------------------------------------------------

    @classmethod
    def default(cls) -> "QuestionRegistry":
        return cls(
            questions={"form": _QUESTIONS_FORM},
            typename_to_type=dict(_FORM_TYPENAME_TO_TYPE),
        )

    def register_project(
        self, project: str, questions: QuestionDict, typename_to_type: Dict[str, str]
    ) -> None:
        self.questions[project] = questions
        self.typename_to_type.update(typename_to_type)

    # -- lookups (preprocess.py:100-145) -----------------------------------

    @property
    def type_to_typename(self) -> Dict[str, str]:
        """type_map.py:44-48 (later typenames win on display-name clash)."""
        return {v: k for k, v in self.typename_to_type.items()}

    def get_questions_for_chunk(
        self, qa_id: str, is_compound: bool = False, return_dict: bool = False
    ):
        """preprocess.py:100-145 — walk the dotted path; for compound
        fields, ``is_compound`` selects the 'compound' question list and
        ``return_dict`` the full signature OrderedDict."""
        if qa_id == "all":
            return self.questions
        node = self.questions
        for typename in qa_id.split("."):
            node = node[typename]
        if is_compound:
            node = node["compound"]
        assert isinstance(node, list) != return_dict, (
            f"Set is_compound=True for {qa_id} to get its question list, or "
            "return_dict=True to get the compound signature OrderedDict."
        )
        return node

    def compound_signature(self, qa_id: str) -> "OrderedDict[str, List[str]]":
        """The ordered typename signature of a compound field (minus the
        'compound' key) — order defines answer concatenation order
        (basic_to_squad.py:95-114)."""
        sig = OrderedDict(self.get_questions_for_chunk(qa_id, return_dict=True))
        sig.pop("compound", None)
        return sig

    def is_compound(self, qa_id: str) -> bool:
        node = self.questions
        try:
            for typename in qa_id.split("."):
                node = node[typename]
        except (KeyError, TypeError):
            return False
        return isinstance(node, dict)

    # -- qa_id expansion (preprocess.py:148-235) ---------------------------

    def get_all_qa_ids(
        self,
        document_class: Optional[str] = None,
        list_of_type_names: Optional[List[str]] = None,
        list_of_use_compound_question: Optional[List[str]] = None,
        list_of_subchunks_to_list: Optional[List[str]] = None,
        list_subchunks_to_complement_siblings: Optional[List[str]] = None,
        list_of_subchunks_to_skip: Optional[List[str]] = None,
    ) -> List[str]:
        """Expand the closed universe of qa_ids every document must answer
        (the forced-N/A anti-join universe, basic_to_squad.py:294-312)."""
        list_of_type_names = list_of_type_names or []
        list_of_use_compound_question = list_of_use_compound_question or []
        list_of_subchunks_to_list = list_of_subchunks_to_list or []
        complement_siblings = list_subchunks_to_complement_siblings or []
        skip = list_of_subchunks_to_skip or []
        ignore = [sc.rsplit(".", 1)[0] for sc in complement_siblings]

        out: List[str] = []

        def recurse(node, base: str, acc: List[str]):
            if isinstance(node, list) and not base.endswith("compound"):
                acc.append(base)
            if isinstance(node, dict):
                if base in list_of_use_compound_question:
                    acc.append(base)
                elif base not in ignore:
                    for tn, value in node.items():
                        if tn not in skip:
                            recurse(value, f"{base}.{tn}", acc)
            return acc

        for doc_class, qdict in self.questions.items():
            if document_class is not None and doc_class != document_class:
                continue
            for typename, node in qdict.items():
                qa_id = f"{doc_class}.{typename}"
                if qa_id in list_of_type_names:
                    out.extend(recurse(node, qa_id, []))

        for qa_id in list_of_subchunks_to_list:
            parts = qa_id.split(".")
            if document_class is None or document_class == parts[0]:
                out.append(f"{parts[0]}.{parts[-1]}_list")

        return out

    # -- question complements (preprocess.py:238-250) ----------------------

    @staticmethod
    def complement_questions(questions, complement: str = COMPLEMENT):
        if isinstance(questions, str):
            return questions.replace("?", complement)
        return [q.replace("?", complement) for q in questions]


def default_type_names(project: str = "form") -> List[str]:
    """Mirror of the reference's params.yaml:32-46 type_names: every
    top-level field except ``doc_id_uf`` (present in the question
    registry but not configured — its display type is deliberately
    absent from the type map, exactly like the reference), with
    ``endereco`` used as a compound."""
    reg = QuestionRegistry.default()
    return [
        f"{project}.{tn}"
        for tn in reg.questions[project].keys()
        if tn != "doc_id_uf"
    ]
