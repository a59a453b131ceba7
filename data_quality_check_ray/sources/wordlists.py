"""Deterministic per-language word lists.

These are the *training corpus* for the langid / perplexity models AND the
vocabulary of the synthetic page generator — entirely self-contained, no
external data.  Each list mixes high-frequency stopwords (needed by the
stop-word-fraction rule) with longer, orthographically distinctive words
(accents/umlauts give the char-trigram langid model strong signal).
"""

from __future__ import annotations

WORDLISTS: dict[str, list[str]] = {
    "en": """the and of to in that it is was for with as his on be at by had
        not are but from or have an they which one you were her all she there
        would their we him been has when who will more about people through
        world government development information country national history
        system question company different important children school family
        """.split(),
    "de": """der die und das ist nicht ein eine mit sich des dem sein einer
        auch auf wird nach bei einem werden aus noch wie einen über müssen
        können zwischen während schön größe straße mädchen übrigens natürlich
        vielleicht wirklich deutschland gesellschaft entwicklung regierung
        geschichte wichtig verschiedene kinder schule familie unternehmen
        """.split(),
    "fr": """le la les des une est dans pour que qui sur avec pas être cette
        aux par plus ont son ses mais comme tout nous vous leur sont après
        même très français déjà naturellement peut développement société
        gouvernement toujours beaucoup histoire important différent enfants
        école famille entreprise monde pays question nationale système
        """.split(),
    "es": """el la los las una está para que con por como más pero sus año
        también desde están ser han fue entre sin sobre todo esta cuando
        español niño señor corazón música después información desarrollo
        gobierno siempre mucho historia importante diferentes niños escuela
        familia empresa mundo país pregunta nacional sistema pueblo
        """.split(),
    "nl": """de het een van en dat is in op niet zijn met voor aan er ook
        maar dan nog wordt heeft tussen tegen werd door naar uit over deze
        geweest natuurlijk misschien ontwikkeling maatschappij gezelschap
        altijd geschiedenis belangrijk verschillende kinderen school familie
        bedrijf wereld land vraag nationale systeem mensen regering
        """.split(),
}

#: Multilingual stop-word set used by the stop-word-fraction heuristic rule.
#: Short function words only (the first ~18 entries of each list).
STOPWORDS: frozenset[str] = frozenset(
    w for words in WORDLISTS.values() for w in words[:18]
)

#: Benign placeholder toxicity terms (FIXTURES.md §1); the generator embeds
#: them, the decision stage drops documents containing any (C4-style).
TOXICITY_TERMS: tuple[str, ...] = ("noxweed", "grimspit", "vilethorn", "blightmaw")
