"""CJK + Arabic transliteration tables for the diacritic-folding kernel.

The reference folds text with ``unidecode`` (``intertext/intertext.py:
1143-1144``), which transliterates EVERY script.  unidecode is not
importable in this environment, so — as with the Greek/Cyrillic tables in
``functions/text.py`` — we pin explicit standard-romanization tables for
the two remaining major script families and document where they differ
from unidecode's published outputs:

- **Arabic** (basic block U+0621–U+064A + Persian extensions + digits):
  simplified ALA-LC-style lowercase consonant romanization.  Harakat
  (short-vowel combining marks) are stripped by the NFKD pass like any
  other combining mark.
- **Kana** (hiragana U+3041–U+3096, katakana U+30A1–U+30FA): per-character
  Hepburn.  Voiced forms (が, ダ...) are in the table directly because
  NFKD would otherwise split them into base + combining voicing mark.
  Like unidecode, the mapping is per-character — digraphs are naive
  (きゃ -> "kiya", not "kya") and the prolonged-sound mark ー maps to "".
- **Hangul** (syllable block U+AC00–U+D7A3): algorithmic decomposition
  into (initial, medial, final) jamo + Revised-Romanization tables —
  complete coverage of all 11,172 syllables with three 30-entry tables.
- **Hanzi**: a pinned subset of the ~130 highest-frequency characters
  with toneless lowercase pinyin.  Characters outside the subset pass
  through (documented residual divergence).  unidecode capitalizes and
  appends a space per hanzi ("Zhong "); we emit bare lowercase ("zhong")
  so folding never changes word counts — a deliberate, documented choice.

Byte-parity with unidecode is *guaranteed* only for the Latin extras
table in ``functions/text.py``; these tables are standard-romanization
pinned, certified end-to-end by the ``fold_diacritics`` driver twin's
injected-char construction and ``tests/test_extras.py``.
"""

from __future__ import annotations

_ARABIC = {
    "ء": "'",   # ء hamza
    "آ": "a",   # آ alef with madda (mapped pre-NFKD)
    "أ": "a",   # أ alef with hamza above
    "ؤ": "u",   # ؤ waw with hamza
    "إ": "i",   # إ alef with hamza below
    "ئ": "i",   # ئ yeh with hamza
    "ا": "a",   # ا alef
    "ب": "b",   # ب beh
    "ة": "h",   # ة teh marbuta
    "ت": "t",   # ت teh
    "ث": "th",  # ث theh
    "ج": "j",   # ج jeem
    "ح": "h",   # ح hah
    "خ": "kh",  # خ khah
    "د": "d",   # د dal
    "ذ": "dh",  # ذ thal
    "ر": "r",   # ر reh
    "ز": "z",   # ز zain
    "س": "s",   # س seen
    "ش": "sh",  # ش sheen
    "ص": "s",   # ص sad
    "ض": "d",   # ض dad
    "ط": "t",   # ط tah
    "ظ": "z",   # ظ zah
    "ع": "'",   # ع ain
    "غ": "gh",  # غ ghain
    "ف": "f",   # ف feh
    "ق": "q",   # ق qaf
    "ك": "k",   # ك kaf
    "ل": "l",   # ل lam
    "م": "m",   # م meem
    "ن": "n",   # ن noon
    "ه": "h",   # ه heh
    "و": "w",   # و waw
    "ى": "a",   # ى alef maksura
    "ي": "y",   # ي yeh
    # Persian / extended
    "پ": "p",   # پ
    "چ": "ch",  # چ
    "ژ": "zh",  # ژ
    "ک": "k",   # ک
    "گ": "g",   # گ
    "ی": "y",   # ی
    "ڤ": "v",   # ڤ
}
# Arabic-Indic + extended Arabic-Indic digits
_ARABIC.update({chr(0x0660 + i): str(i) for i in range(10)})
_ARABIC.update({chr(0x06F0 + i): str(i) for i in range(10)})

# Hepburn kana — base gojūon in hiragana order; voiced/semi-voiced and
# small forms listed explicitly (per-character, like unidecode)
_HIRAGANA = {
    "ぁ": "a", "あ": "a", "ぃ": "i", "い": "i", "ぅ": "u", "う": "u",
    "ぇ": "e", "え": "e", "ぉ": "o", "お": "o",
    "か": "ka", "が": "ga", "き": "ki", "ぎ": "gi", "く": "ku",
    "ぐ": "gu", "け": "ke", "げ": "ge", "こ": "ko", "ご": "go",
    "さ": "sa", "ざ": "za", "し": "shi", "じ": "ji", "す": "su",
    "ず": "zu", "せ": "se", "ぜ": "ze", "そ": "so", "ぞ": "zo",
    "た": "ta", "だ": "da", "ち": "chi", "ぢ": "ji", "っ": "",
    "つ": "tsu", "づ": "zu", "て": "te", "で": "de", "と": "to",
    "ど": "do",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ば": "ba", "ぱ": "pa", "ひ": "hi", "び": "bi",
    "ぴ": "pi", "ふ": "fu", "ぶ": "bu", "ぷ": "pu", "へ": "he",
    "べ": "be", "ぺ": "pe", "ほ": "ho", "ぼ": "bo", "ぽ": "po",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "ゃ": "ya", "や": "ya", "ゅ": "yu", "ゆ": "yu", "ょ": "yo",
    "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "ゎ": "wa", "わ": "wa", "ゐ": "wi", "ゑ": "we", "を": "wo",
    "ん": "n", "ゔ": "vu", "ゕ": "ka", "ゖ": "ke",
}
# katakana mirrors hiragana (offset +0x60 for the shared range) + extras
_KATAKANA = {chr(ord(k) + 0x60): v for k, v in _HIRAGANA.items()}
_KATAKANA.update({"ー": "", "ヴ": "vu", "ヵ": "ka", "ヶ": "ke"})

# ~130 highest-frequency hanzi, toneless lowercase pinyin (documented
# subset — characters outside it pass through)
_HANZI = {
    "的": "de", "一": "yi", "是": "shi", "不": "bu", "了": "le",
    "人": "ren", "我": "wo", "在": "zai", "有": "you", "他": "ta",
    "这": "zhe", "中": "zhong", "大": "da", "来": "lai", "上": "shang",
    "国": "guo", "个": "ge", "到": "dao", "说": "shuo", "们": "men",
    "为": "wei", "子": "zi", "和": "he", "你": "ni", "地": "di",
    "出": "chu", "道": "dao", "也": "ye", "时": "shi", "年": "nian",
    "得": "de", "就": "jiu", "那": "na", "要": "yao", "下": "xia",
    "以": "yi", "生": "sheng", "会": "hui", "自": "zi", "着": "zhe",
    "去": "qu", "之": "zhi", "过": "guo", "家": "jia", "学": "xue",
    "对": "dui", "可": "ke", "她": "ta", "里": "li", "后": "hou",
    "小": "xiao", "么": "me", "心": "xin", "多": "duo", "天": "tian",
    "而": "er", "能": "neng", "好": "hao", "都": "dou", "然": "ran",
    "没": "mei", "日": "ri", "于": "yu", "起": "qi", "还": "hai",
    "发": "fa", "成": "cheng", "事": "shi", "只": "zhi", "作": "zuo",
    "当": "dang", "想": "xiang", "看": "kan", "文": "wen", "无": "wu",
    "开": "kai", "手": "shou", "十": "shi", "用": "yong", "主": "zhu",
    "行": "xing", "方": "fang", "又": "you", "如": "ru", "前": "qian",
    "所": "suo", "本": "ben", "见": "jian", "经": "jing", "头": "tou",
    "面": "mian", "公": "gong", "同": "tong", "三": "san", "已": "yi",
    "老": "lao", "从": "cong", "动": "dong", "两": "liang",
    "长": "chang", "知": "zhi", "民": "min", "样": "yang",
    "现": "xian", "分": "fen", "将": "jiang", "外": "wai",
    "但": "dan", "身": "shen", "些": "xie", "与": "yu", "高": "gao",
    "意": "yi", "进": "jin", "把": "ba", "法": "fa", "此": "ci",
    "实": "shi", "回": "hui", "二": "er", "理": "li", "美": "mei",
    "点": "dian", "月": "yue", "明": "ming", "其": "qi", "种": "zhong",
    "声": "sheng", "全": "quan", "工": "gong", "己": "ji", "话": "hua",
    "儿": "er", "者": "zhe", "向": "xiang", "情": "qing", "门": "men",
    "问": "wen", "力": "li", "水": "shui", "电": "dian", "业": "ye",
}

_CJK_ARABIC = str.maketrans(
    {**_ARABIC, **_HIRAGANA, **_KATAKANA, **_HANZI}
)

# Revised-Romanization jamo tables (complete Hangul coverage via the
# algorithmic syllable decomposition: code = 0xAC00 + (i*21 + m)*28 + f)
_HANGUL_INITIAL = (
    "g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "",
    "j", "jj", "ch", "k", "t", "p", "h",
)
_HANGUL_MEDIAL = (
    "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae",
    "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i",
)
_HANGUL_FINAL = (
    "", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb",
    "ls", "lt", "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j",
    "ch", "k", "t", "p", "h",
)

_HANGUL_BASE, _HANGUL_LAST = 0xAC00, 0xD7A3


def _hangul_syllable(cp: int) -> str:
    idx = cp - _HANGUL_BASE
    i, rest = divmod(idx, 21 * 28)
    m, f = divmod(rest, 28)
    return _HANGUL_INITIAL[i] + _HANGUL_MEDIAL[m] + _HANGUL_FINAL[f]


def romanize_cjk_arabic(text: str) -> str:
    """Apply the Arabic/kana/hanzi tables + algorithmic Hangul.  Runs
    BEFORE NFKD in the fold kernel: NFKD would split voiced kana into
    base + combining mark and Hangul syllables into conjoining jamo,
    losing the direct mappings.  ASCII-only strings return unchanged
    after two C-speed scans (the common case costs two table probes per
    char, no Python-level loop unless Hangul is actually present)."""
    text = text.translate(_CJK_ARABIC)
    # cheap containment scan; only build per-char output if Hangul exists
    if any(_HANGUL_BASE <= ord(c) <= _HANGUL_LAST for c in text):
        text = "".join(
            _hangul_syllable(ord(c))
            if _HANGUL_BASE <= ord(c) <= _HANGUL_LAST
            else c
            for c in text
        )
    return text
