"""Snowball stemmers + language stopword lists (pure python, vendored).

Reference surface: the ``stemmer(language)`` and ``stopwords_language``
token filters (tokenizers/src/manager.rs:42-59; applied in the fixed
filter chain at :315-337).  The reference delegates to rust-stemmers /
Tantivy's built-in stopword lists; both derive from the public Snowball
project (https://snowballstem.org) and Lucene's classic English stop set,
re-implemented here from the published algorithm description.

Notes on parity with the reference goldens
(tests/pg_regress/expected/tokenizer-typmod.out):
- the stemmer receives tokens AS-IS (no internal lowercasing):
  ``'Running' -> 'Run'`` when ``lowercase=false`` — suffix comparisons
  are against literal lowercase suffixes, so an uppercase prefix simply
  never matches a suffix rule, exactly like rust-stemmers.
- stopword matching is exact (post-lowercase in the default chain).
"""

from __future__ import annotations

_VOWELS = set("aeiouy")
_DOUBLES = {"bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"}
_LI_END = set("cdeghkmnrt")

_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS2 = {"inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed"}


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _mark_ys(word: str) -> str:
    # y at start, or after a vowel, is a consonant — mark as 'Y'
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def _r1_r2(word: str) -> tuple[int, int]:
    # R1: after the first non-vowel following a vowel
    def region_after(start: int) -> int:
        for i in range(start, len(word) - 1):
            if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
                return i + 2
        return len(word)

    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        r1 = region_after(0)
    r2 = region_after(r1)
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (b in _VOWELS and c not in _VOWELS and c not in "wxY"
                and a not in _VOWELS)
    return False


def _contains_vowel(s: str) -> bool:
    return any(ch in _VOWELS for ch in s)


def porter2(word: str) -> str:
    """Snowball 'english' (Porter2) stemmer — the algorithm as published
    at snowballstem.org/algorithms/english/stemmer.html."""
    if len(word) <= 2:
        return word
    if word in _EXCEPTIONS1:
        return _EXCEPTIONS1[word]

    w = _mark_ys(word)

    # step 0: strip trailing apostrophe forms
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    r1, r2 = _r1_r2(w)

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and _contains_vowel(w[:-2]):
        w = w[:-1]

    if w in _EXCEPTIONS2:
        return w.replace("Y", "y")

    # step 1b
    step1b_done = False
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            step1b_done = True
            break
    if not step1b_done:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf) and _contains_vowel(w[: -len(suf)]):
                w = w[: -len(suf)]
                if w.endswith(("at", "bl", "iz")):
                    w += "e"
                elif w[-2:] in _DOUBLES:
                    w = w[:-1]
                elif r1 >= len(w) and _ends_short_syllable(w):
                    # the word is short: R1 empty + ends in short syllable
                    w += "e"
                break

    # step 1c: y/Y → i when preceded by a non-vowel that isn't first char
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOWELS):
        w = w[:-1] + "i"

    def in_r1(suffix: str) -> bool:
        return len(w) - len(suffix) >= r1

    def in_r2(suffix: str) -> bool:
        return len(w) - len(suffix) >= r2

    # step 2 (longest suffix, in R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if in_r1(suf):
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ogi"):
            if in_r1("ogi") and len(w) > 3 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if in_r1("li") and len(w) > 2 and w[-3] in _LI_END:
                w = w[:-2]

    # step 3 (in R1)
    step3 = [("ational", "ate"), ("tional", "tion"), ("alize", "al"),
             ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
             ("ness", ""), ("ful", "")]
    for suf, rep in step3:
        if w.endswith(suf):
            if in_r1(suf):
                w = w[: -len(suf)] + rep
            break
    else:
        if w.endswith("ative") and in_r1("ative") and in_r2("ative"):
            w = w[:-5]

    # step 4 (in R2)
    step4 = ["ement", "ance", "ence", "able", "ible", "ment", "ant",
             "ent", "ism", "ate", "iti", "ous", "ive", "ize", "al",
             "er", "ic"]
    for suf in step4:
        if w.endswith(suf):
            if in_r2(suf):
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and in_r2("ion") and len(w) > 3 and w[-4] in "st":
            w = w[:-3]

    # step 5
    if w.endswith("e"):
        if in_r2("e") or (in_r1("e")
                          and not _ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("l") and in_r2("l") and len(w) > 1 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


STEMMERS = {"english": porter2, "en": porter2}


def stem(word: str, language: str = "english") -> str:
    lang = language.lower()
    if lang not in STEMMERS:
        raise ValueError(
            f"stemmer language {language!r} not supported (supported: "
            f"{sorted(set(STEMMERS))}); reference supports all Snowball "
            "languages — extend STEMMERS to add one")
    return STEMMERS[lang](word)


# ---------------------------------------------------------------------------
# stopword lists (Tantivy StopWordFilter::new equivalents)
# ---------------------------------------------------------------------------

# Lucene/Tantivy classic English stop set (tantivy stop_word_filter default)
STOPWORDS_EN = frozenset("""
a an and are as at be but by for if in into is it no not of on or such that
the their then there these they this to was will with
""".split())

# Snowball French stop list (snowballstem.org french/stop.txt)
STOPWORDS_FR = frozenset("""
au aux avec ce ces dans de des du elle en et eux il ils je la le les leur lui
ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu que qui sa
se ses son sur ta te tes toi ton tu un une vos votre vous c d j l à m n s t y
été étée étées étés étant étante étants étantes suis es est sommes êtes sont
serai seras sera serons serez seront serais serait serions seriez seraient
étais était étions étiez étaient fus fut fûmes fûtes furent sois soit soyons
soyez soient fusse fusses fût fussions fussiez fussent ayant ayante ayantes
ayants eu eue eues eus ai as avons avez ont aurai auras aura aurons aurez
auront aurais aurait aurions auriez auraient avais avait avions aviez avaient
eut eûmes eûtes eurent aie aies ait ayons ayez aient eusse eusses eût eussions
eussiez eussent
""".split())

# Snowball German stop list (abridged to the published set)
STOPWORDS_DE = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem anderen
anderer anderes anderm andern anderr anders auch auf aus bei bin bis bist da
damit dann der den des dem die das dass daß derselbe derselben denselben
desselben demselben dieselbe dieselben dasselbe dazu dein deine deinem deinen
deiner deines denn derer dessen dich dir du dies diese diesem diesen dieser
dieses doch dort durch ein eine einem einen einer eines einig einige einigem
einigen einiger einiges einmal er ihn ihm es etwas euer eure eurem euren eurer
eures für gegen gewesen hab habe haben hat hatte hatten hier hin hinter ich
mich mir ihr ihre ihrem ihren ihrer ihres euch im in indem ins ist jede jedem
jeden jeder jedes jene jenem jenen jener jenes jetzt kann kein keine keinem
keinen keiner keines können könnte machen man manche manchem manchen mancher
manches mein meine meinem meinen meiner meines mit muss musste nach nicht
nichts noch nun nur ob oder ohne sehr sein seine seinem seinen seiner seines
selbst sich sie ihnen sind so solche solchem solchen solcher solches soll
sollte sondern sonst über um und uns unsere unserem unseren unser unseres
unter viel vom von vor während war waren warst was weg weil weiter welche
welchem welchen welcher welches wenn werde werden wie wieder will wir wird
wirst wo wollen wollte würde würden zu zum zur zwar zwischen
""".split())

# Snowball Spanish stop list
STOPWORDS_ES = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como más
pero sus le ya o este sí porque esta entre cuando muy sin sobre también me
hasta hay donde quien desde todo nos durante todos uno les ni contra otros
ese eso ante ellos e esto mí antes algunos qué unos yo otro otras otra él
tanto esa estos mucho quienes nada muchos cual poco ella estar estas algunas
algo nosotros mi mis tú te ti tu tus ellas nosotras vosotros vosotras os mío
mía míos mías tuyo tuya tuyos tuyas suyo suya suyos suyas nuestro nuestra
nuestros nuestras vuestro vuestra vuestros vuestras esos esas estoy estás
está estamos estáis están esté estés estemos estéis estén estaré estarás
estará estaremos estaréis estarán estaría estarías estaríamos estaríais
estarían estaba estabas estábamos estabais estaban estuve estuviste estuvo
estuvimos estuvisteis estuvieron estuviera estuvieras estuviéramos
estuvierais estuvieran estuviese estuvieses estuviésemos estuvieseis
estuviesen estando estado estada estados estadas estad he has ha hemos
habéis han haya hayas hayamos hayáis hayan habré habrás habrá habremos
habréis habrán habría habrías habríamos habríais habrían había habías
habíamos habíais habían hube hubiste hubo hubimos hubisteis hubieron hubiera
hubieras hubiéramos hubierais hubieran hubiese hubieses hubiésemos hubieseis
hubiesen habiendo habido habida habidos habidas soy eres es somos sois son
sea seas seamos seáis sean seré serás será seremos seréis serán sería serías
seríamos seríais serían era eras éramos erais eran fui fuiste fue fuimos
fuisteis fueron fuera fueras fuéramos fuerais fueran fuese fueses fuésemos
fueseis fuesen siendo sido tengo tienes tiene tenemos tenéis tienen tenga
tengas tengamos tengáis tengan tendré tendrás tendrá tendremos tendréis
tendrán tendría tendrías tendríamos tendríais tendrían tenía tenías teníamos
teníais tenían tuve tuviste tuvo tuvimos tuvisteis tuvieron tuviera tuvieras
tuviéramos tuvierais tuvieran tuviese tuvieses tuviésemos tuvieseis tuviesen
teniendo tenido tenida tenidos tenidas tened
""".split())

STOPWORD_LISTS = {
    "english": STOPWORDS_EN, "en": STOPWORDS_EN,
    "french": STOPWORDS_FR, "fr": STOPWORDS_FR,
    "german": STOPWORDS_DE, "de": STOPWORDS_DE,
    "spanish": STOPWORDS_ES, "es": STOPWORDS_ES,
}


def stopwords_for(languages) -> frozenset:
    """Union of stopword lists for one language or a list of languages
    (reference parse_stopwords_language accepts both, manager.rs:97-128)."""
    if isinstance(languages, str):
        languages = [s.strip() for s in languages.split(",")]
    out: set = set()
    for lang in languages:
        key = lang.lower()
        if key not in STOPWORD_LISTS:
            raise ValueError(
                f"stopwords_language {lang!r} not supported (supported: "
                "english, french, german, spanish)")
        out |= STOPWORD_LISTS[key]
    return frozenset(out)
