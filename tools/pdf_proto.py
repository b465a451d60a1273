#!/usr/bin/env python3
"""Dev-only prototype of the PdfCodec v2 decode algorithm (ObjStm +
ToUnicode/CID + matrix-tracked line assembly). Used to iterate against the
reference goldens before porting the logic to Scala. NOT part of the
engine, and BEHIND the Scala implementation on late round-8 findings
(q/Q text-state restore, WinAnsi 0x80-0x9F fallback, exact-origin
overprint dedup, core-family gating of the GID table) —
graft.functions.PdfCodec is authoritative."""
import re, sys, zlib

WS = b' \t\r\n\x00\x0c'


def scan_objects(b):
    """All `N G obj ... endobj` spans -> {num: (dict_text, stream_bytes)}."""
    objs = {}
    for m in re.finditer(rb'(?<![0-9])(\d+)\s+(\d+)\s+obj\b', b):
        num = int(m.group(1))
        start = m.end()
        end = b.find(b'endobj', start)
        if end < 0:
            end = len(b)
        body = b[start:end]
        sk = body.find(b'stream')
        stream = None
        if sk >= 0:
            p = sk + 6
            if body[p:p+1] == b'\r':
                p += 1
            if body[p:p+1] == b'\n':
                p += 1
            se = body.find(b'endstream', p)
            if se < 0:
                se = len(body)
            stream = body[p:se]
            dict_text = body[:sk]
        else:
            dict_text = body
        objs[num] = (dict_text.decode('latin-1'), stream)
    return objs


def inflate(d):
    try:
        return zlib.decompress(d)
    except Exception:
        try:
            return zlib.decompressobj().decompress(d)
        except Exception:
            return b''


def dict_int(dic, key):
    m = re.search(re.escape(key) + r'\s*(\d+)', dic)
    return int(m.group(1)) if m else None


def expand_objstm(objs):
    """Parse /Type /ObjStm streams and add contained objects (absent nums)."""
    new = {}
    for num, (dic, stream) in objs.items():
        if '/ObjStm' not in dic or stream is None:
            continue
        data = inflate(stream) if '/FlateDecode' in dic else stream
        n = dict_int(dic, '/N')
        first = dict_int(dic, '/First')
        if not n or first is None:
            continue
        header = data[:first].decode('latin-1')
        nums = [int(x) for x in header.split()]
        pairs = list(zip(nums[0::2], nums[1::2]))[:n]
        for i, (onum, off) in enumerate(pairs):
            end = pairs[i+1][1] if i + 1 < len(pairs) else len(data) - first
            body = data[first+off:first+end].decode('latin-1')
            new.setdefault(onum, (body, None))
    for k, v in new.items():
        if k not in objs:
            objs[k] = v
    return objs


REF_RE = re.compile(r'^\s*(\d+)\s+\d+\s+R')


def dict_ref(dic, key):
    at = dic.find(key)
    while at >= 0:
        nxt = dic[at+len(key):]
        # key must not be a prefix of a longer name (e.g. /Font vs /FontFile)
        if nxt[:1].isalnum() and key[-1].isalpha():
            at = dic.find(key, at + 1)
            continue
        m = REF_RE.match(nxt)
        return int(m.group(1)) if m else None
    return None


def dict_ref_array(dic, key):
    at = dic.find(key)
    if at < 0:
        return []
    rest = dic[at+len(key):]
    m = re.match(r'\s*\[', rest)    # array form
    if not m:
        r = dict_ref(dic, key)
        return [r] if r is not None else []
    close = rest.find(']')
    return [int(g) for g in re.findall(r'(\d+)\s+\d+\s+R', rest[:close])]


def page_order(objs):
    cat = next((n for n, (d, s) in objs.items() if '/Catalog' in d), None)
    root = dict_ref(objs[cat][0], '/Pages') if cat is not None else None
    out = []

    def walk(num, depth):
        if depth > 64 or num not in objs:
            return
        d = objs[num][0]
        kids = dict_ref_array(d, '/Kids')
        if kids and '/Pages' in d:
            for k in kids:
                walk(k, depth + 1)
        elif '/Page' in d:
            out.append(num)
    if root is not None:
        walk(root, 0)
    return out


def nested_dict_slice(dic, key):
    """Return the balanced << >> slice following key, or '' """
    at = dic.find(key)
    if at < 0:
        return ''
    i = dic.find('<<', at)
    if i < 0:
        return ''
    depth = 0
    j = i
    while j < len(dic) - 1:
        if dic[j:j+2] == '<<':
            depth += 1
            j += 2
        elif dic[j:j+2] == '>>':
            depth -= 1
            j += 2
            if depth == 0:
                return dic[i:j]
        else:
            j += 1
    return dic[i:]


def parse_tounicode(data):
    """bfchar/bfrange CMap -> (codebytes, {code:str})."""
    text = data.decode('latin-1')
    cmap = {}
    codebytes = 1
    m = re.search(r'begincodespacerange(.*?)endcodespacerange', text, re.S)
    if m:
        lo = re.search(r'<([0-9A-Fa-f]+)>', m.group(1))
        if lo:
            codebytes = max(1, len(lo.group(1)) // 2)
    for m in re.finditer(r'beginbfchar(.*?)endbfchar', text, re.S):
        for mm in re.finditer(r'<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>',
                              m.group(1)):
            src = int(mm.group(1), 16)
            dst = mm.group(2)
            cmap[src] = hex_to_unicode(dst)
            codebytes = max(codebytes, len(mm.group(1)) // 2)
    for m in re.finditer(r'beginbfrange(.*?)endbfrange', text, re.S):
        body = m.group(1)
        # form: <lo> <hi> <dst>   |   <lo> <hi> [<d1> <d2> ...]
        for mm in re.finditer(
                r'<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)',
                body):
            lo = int(mm.group(1), 16)
            hi = int(mm.group(2), 16)
            dst = mm.group(3)
            codebytes = max(codebytes, len(mm.group(1)) // 2)
            if dst.startswith('['):
                items = re.findall(r'<([0-9A-Fa-f]+)>', dst)
                for k, it in enumerate(items):
                    if lo + k <= hi:
                        cmap[lo + k] = hex_to_unicode(it)
            else:
                d0 = int(dst[1:-1], 16)
                for k in range(hi - lo + 1):
                    cmap[lo + k] = chr(d0 + k) if d0 + k < 0x110000 else ''
    return codebytes, cmap


def hex_to_unicode(h):
    # UTF-16BE code units
    units = [int(h[i:i+4], 16) for i in range(0, len(h) - 3, 4)]
    out = []
    i = 0
    while i < len(units):
        u = units[i]
        if 0xD800 <= u <= 0xDBFF and i + 1 < len(units):
            out.append(chr(0x10000 + ((u - 0xD800) << 10) +
                           (units[i+1] - 0xDC00)))
            i += 2
        else:
            out.append(chr(u))
            i += 1
    return ''.join(out)


class Font:
    __slots__ = ('cb', 'cmap', 'widths', 'first', 'dw', 'cidw')

    def __init__(self, cb, cmap, widths, first, dw, cidw):
        self.cb = cb          # code bytes (1 simple, 2 CID)
        self.cmap = cmap      # ToUnicode {code: str} or None
        self.widths = widths  # simple-font /Widths list or None
        self.first = first    # /FirstChar
        self.dw = dw          # CID /DW (or simple MissingWidth)
        self.cidw = cidw      # CID {code: w} or None

    def width(self, code):
        """Glyph advance in 1/1000 text units."""
        if self.cb == 2:
            if self.cidw is not None and code in self.cidw:
                return self.cidw[code]
            return self.dw
        if self.widths is not None:
            i = code - self.first
            if 0 <= i < len(self.widths) and self.widths[i] > 0:
                return self.widths[i]
        return self.dw


def parse_w_array(s):
    """CID /W array: `c [w1 w2 ...]` and `c1 c2 w` runs -> {cid: w}."""
    out = {}
    toks = re.findall(r'\[|\]|-?\d+\.?\d*', s)
    i = 0
    pend = []
    while i < len(toks):
        t = toks[i]
        if t == '[':
            if not pend:
                i += 1      # outer array opener (or stray) — skip
                continue
            j = i + 1
            ws = []
            while j < len(toks) and toks[j] != ']':
                ws.append(float(toks[j]))
                j += 1
            if pend:
                c = int(pend[-1])
                for k, w in enumerate(ws):
                    out[c + k] = w
            pend = []
            i = j + 1
        elif t == ']':
            i += 1
        else:
            pend.append(float(t))
            if len(pend) == 3:
                c1, c2, w = int(pend[0]), int(pend[1]), pend[2]
                for c in range(c1, c2 + 1):
                    out[c] = w
                pend = []
            i += 1
    return out


def dict_value_slice(dic, key, objs):
    """Value of key: inline [..] array text, or resolved indirect ref."""
    at = dic.find(key)
    if at < 0:
        return None
    rest = dic[at+len(key):]
    m = re.match(r'\s*\[', rest)
    if m:
        depth = 0
        for j, ch in enumerate(rest):
            if ch == '[':
                depth += 1
            elif ch == ']':
                depth -= 1
                if depth == 0:
                    return rest[:j+1]
        return rest
    r = dict_ref(dic, key)
    if r is not None and r in objs:
        return objs[r][0]
    return None


AGL = {
    'space': ' ', 'exclam': '!', 'quotedbl': '"', 'numbersign': '#',
    'dollar': '$', 'percent': '%', 'ampersand': '&', 'quotesingle': "'",
    'parenleft': '(', 'parenright': ')', 'asterisk': '*', 'plus': '+',
    'comma': ',', 'hyphen': '-', 'period': '.', 'slash': '/',
    'zero': '0', 'one': '1', 'two': '2', 'three': '3', 'four': '4',
    'five': '5', 'six': '6', 'seven': '7', 'eight': '8', 'nine': '9',
    'colon': ':', 'semicolon': ';', 'less': '<', 'equal': '=',
    'greater': '>', 'question': '?', 'at': '@', 'bracketleft': '[',
    'backslash': '\\', 'bracketright': ']', 'asciicircum': '^',
    'underscore': '_', 'grave': '`', 'braceleft': '{', 'bar': '|',
    'braceright': '}', 'asciitilde': '~',
    'aacute': 'á', 'agrave': 'à', 'acircumflex': 'â', 'atilde': 'ã',
    'adieresis': 'ä', 'ccedilla': 'ç', 'eacute': 'é', 'egrave': 'è',
    'ecircumflex': 'ê', 'edieresis': 'ë', 'iacute': 'í', 'igrave': 'ì',
    'icircumflex': 'î', 'idieresis': 'ï', 'oacute': 'ó', 'ograve': 'ò',
    'ocircumflex': 'ô', 'otilde': 'õ', 'odieresis': 'ö', 'uacute': 'ú',
    'ugrave': 'ù', 'ucircumflex': 'û', 'udieresis': 'ü', 'ntilde': 'ñ',
    'Aacute': 'Á', 'Agrave': 'À', 'Acircumflex': 'Â', 'Atilde': 'Ã',
    'Ccedilla': 'Ç', 'Eacute': 'É', 'Ecircumflex': 'Ê', 'Iacute': 'Í',
    'Oacute': 'Ó', 'Ocircumflex': 'Ô', 'Otilde': 'Õ', 'Uacute': 'Ú',
    'quoteright': '’', 'quoteleft': '‘',
    'quotedblleft': '“', 'quotedblright': '”',
    'endash': '–', 'emdash': '—', 'bullet': '•',
    'ellipsis': '…', 'degree': '°', 'ordmasculine': 'º',
    'ordfeminine': 'ª', 'multiply': '×', 'divide': '÷', 'minus': '−',
    'periodcentered': '·', 'middot': '·', 'pi': 'π', 'mu': 'μ',
    'Delta': 'Δ', 'registered': '®', 'copyright': '©', 'trademark': '™',
    'percent_sign': '%', 'section': '§', 'cedilla': '¸',
}


def parse_differences(enc_dict):
    """/Encoding /Differences array -> {code: unicode} via the AGL."""
    at = enc_dict.find('/Differences')
    if at < 0:
        return None
    rest = enc_dict[at+len('/Differences'):]
    o = rest.find('[')
    c = rest.find(']')
    if o < 0 or c < 0:
        return None
    out = {}
    code = 0
    for tok in re.findall(r'(\d+)|/([\w.]+)', rest[o+1:c]):
        if tok[0]:
            code = int(tok[0])
        else:
            name = tok[1]
            if name in AGL:
                out[code] = AGL[name]
            elif len(name) == 1:
                out[code] = name          # /a /B single-letter names
            elif re.fullmatch(r'uni([0-9A-Fa-f]{4})', name):
                out[code] = chr(int(name[3:], 16))
            else:
                m2 = re.fullmatch(r'g(\d+)', name)
                u = gid_to_unicode(int(m2.group(1)), AGL) if m2 else None
                out[code] = u if u is not None else '\ufffd'
            code += 1
    return out or None


def font_decoders(res_dict, objs):
    """/Font resources -> {name: Font}."""
    fonts = {}
    fdict = nested_dict_slice(res_dict, '/Font')
    if not fdict:
        return fonts
    for m in re.finditer(r'/([\w.]+)\s+(\d+)\s+\d+\s+R', fdict):
        name, ref = m.group(1), int(m.group(2))
        if ref not in objs:
            continue
        d = objs[ref][0]
        # code width comes from the FONT TYPE (Type0/Identity-H = 2-byte
        # CIDs, simple fonts = 1 byte) — NEVER from the ToUnicode CMap,
        # whose bfchar keys are conventionally written 4-hex-digit even
        # for simple fonts.
        cb = 2 if (('/Type0' in d) or ('Identity-H' in d)) else 1
        tu = dict_ref(d, '/ToUnicode')
        cmap = None
        if tu is not None and tu in objs and objs[tu][1] is not None:
            data = objs[tu][1]
            if '/FlateDecode' in objs[tu][0]:
                data = inflate(data)
            _, cmap = parse_tounicode(data)
        if cb == 1:
            # /Differences fills codes the (possibly sparse) ToUnicode
            # misses; ToUnicode wins per code
            enc = dict_ref(d, '/Encoding')
            enc_dict = objs[enc][0] if (enc is not None and enc in objs) \
                else nested_dict_slice(d, '/Encoding')
            if enc_dict:
                diff = parse_differences(enc_dict)
                if diff:
                    cmap = diff if cmap is None else {**diff, **cmap}
        widths = None
        first = 0
        dw = 500.0
        cidw = None
        if cb == 2:
            # /DescendantFonts -> CIDFont dict (array, inline or ref)
            desc = dict_value_slice(d, '/DescendantFonts', objs)
            cd = None
            if desc:
                rm = re.search(r'(\d+)\s+\d+\s+R', desc)
                if rm and int(rm.group(1)) in objs:
                    cd = objs[int(rm.group(1))][0]
            if cd:
                dm = re.search(r'/DW\s+(\d+\.?\d*)', cd)
                dw = float(dm.group(1)) if dm else 1000.0
                ws = dict_value_slice(cd, '/W', objs)
                if ws:
                    cidw = parse_w_array(ws)
            else:
                dw = 1000.0
        else:
            fm = re.search(r'/FirstChar\s+(\d+)', d)
            first = int(fm.group(1)) if fm else 0
            ws = dict_value_slice(d, '/Widths', objs)
            if ws:
                widths = [float(x) for x in re.findall(r'-?\d+\.?\d*', ws)]
        fonts[name] = Font(cb, cmap, widths, first, dw, cidw)
    return fonts


def resources_of(dic, objs):
    r = dict_ref(dic, '/Resources')
    if r is not None and r in objs:
        return objs[r][0]
    return nested_dict_slice(dic, '/Resources') or dic


LINE_DIST = 0.8    # |perp offset| > size*LINE_DIST -> new line
GAP_LINE = 0.81    # along-gap > size*GAP_LINE -> new line (block split)
SPACE_DIST = 0.15  # size*SPACE_DIST < gap <= size*GAP_LINE -> synth space
BACK_DIST = -0.5   # backward along-move beyond size*BACK_DIST -> new line


class TextState:
    """MuPDF-style geometric line assembly, writing-direction aware:
    a glyph run joins the current line when its start point lies on the
    previous run's baseline (small perpendicular offset) and close to its
    end (small along-baseline gap); larger along-gaps synthesize a space
    or start a new line (table-column splits)."""
    __slots__ = ('out', 'cur_line', 'last_end', 'last_dir', 'last_size',
                 'was_tab')

    def __init__(self):
        self.out = []
        self.cur_line = []
        self.last_end = None    # (x, y) device end of previous run
        self.last_dir = None    # (dx, dy) unit baseline direction
        self.last_size = None
        self.was_tab = False    # previous span was a tab-mapped space

    def newline(self):
        self.out.append(''.join(self.cur_line))
        self.cur_line = []
        self.last_end = None
        self.last_dir = None

    def show(self, s, start, end, direction, size):
        """Emit decoded run s from device point start to end."""
        # Tab-mapped space glyphs (ToUnicode FEFF0009) render as plain
        # spaces (golden page text contains zero tabs), but a real space
        # glyph OVERPRINTED on a tab glyph (same pen position) emits
        # only once — see was_tab dedup below.
        is_tab = s != '' and s.strip('\t') == ''
        s = s.replace('\t', ' ')
        if not s:
            return
        sz = max(size, self.last_size or 0.0, 1e-6)
        if self.cur_line and self.last_end is not None:
            dx = start[0] - self.last_end[0]
            dy = start[1] - self.last_end[1]
            ux, uy = self.last_dir
            along = dx * ux + dy * uy
            perp = dx * uy - dy * ux
            same_dir = (direction[0] * ux + direction[1] * uy) > 0.7
            if not same_dir or abs(perp) > sz * LINE_DIST:
                self.newline()
            elif along > sz * GAP_LINE or along < sz * BACK_DIST:
                self.newline()
            elif along > sz * SPACE_DIST:
                prev = self.cur_line[-1][-1:] if self.cur_line else ''
                if prev != ' ' and not s.startswith(' '):
                    self.cur_line.append(' ')
            elif (along < -0.05 * sz and s.strip() == '' and self.was_tab):
                # real space overprinted on the tab glyph: emit once
                return
        self.cur_line.append(s)
        self.last_end = end
        self.last_dir = direction
        self.last_size = size
        self.was_tab = is_tab

    def finish(self):
        if self.cur_line:
            self.out.append(''.join(self.cur_line))
            self.cur_line = []
        return '\n'.join(self.out) + ('\n' if self.out else '')


def decode_literal(raw):
    """PDF literal string body (bytes between parens) -> list of byte values."""
    out = []
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        if c == 0x5c and i + 1 < n:  # backslash
            d = raw[i+1]
            if d == ord('n'):
                out.append(10); i += 2
            elif d == ord('r'):
                out.append(13); i += 2
            elif d == ord('t'):
                out.append(9); i += 2
            elif d == ord('b'):
                out.append(8); i += 2
            elif d == ord('f'):
                out.append(12); i += 2
            elif d in (ord('('), ord(')'), 0x5c):
                out.append(d); i += 2
            elif d == 10:
                i += 2
            elif d == 13:
                i += 2
                if i < n and raw[i] == 10:
                    i += 1
            elif ord('0') <= d <= ord('7'):
                v = 0
                i += 1
                k = 0
                while k < 3 and i < n and ord('0') <= raw[i] <= ord('7'):
                    v = v * 8 + (raw[i] - ord('0'))
                    i += 1
                    k += 1
                out.append(v & 0xff)
            else:
                out.append(d); i += 2
        else:
            out.append(c)
            i += 1
    return out


class Lexer:
    """Minimal content-stream tokenizer: yields ('str', bytes) / ('hex',
    bytes) / ('num', float) / ('name', str) / ('op', str) /
    ('arr_open'/'arr_close', None) / ('dict', None)."""

    def __init__(self, data):
        self.d = data
        self.i = 0
        self.n = len(data)

    def tokens(self):
        d, n = self.d, self.n
        i = self.i
        while i < n:
            c = d[i]
            if c in WS:
                i += 1
                continue
            if c == ord('%'):
                while i < n and d[i] not in (10, 13):
                    i += 1
                continue
            if c == ord('('):
                depth = 1
                j = i + 1
                buf = bytearray()
                while j < n and depth > 0:
                    ch = d[j]
                    if ch == 0x5c:
                        buf.append(ch)
                        if j + 1 < n:
                            buf.append(d[j+1])
                        j += 2
                        continue
                    if ch == ord('('):
                        depth += 1
                    elif ch == ord(')'):
                        depth -= 1
                        if depth == 0:
                            break
                    buf.append(ch)
                    j += 1
                yield ('str', bytes(buf))
                i = j + 1
                continue
            if c == ord('<'):
                if i + 1 < n and d[i+1] == ord('<'):
                    depth = 0
                    j = i
                    while j < n - 1:
                        if d[j] == ord('<') and d[j+1] == ord('<'):
                            depth += 1
                            j += 2
                        elif d[j] == ord('>') and d[j+1] == ord('>'):
                            depth -= 1
                            j += 2
                            if depth == 0:
                                break
                        else:
                            j += 1
                    yield ('dict', None)
                    i = j
                    continue
                j = d.find(b'>', i + 1)
                if j < 0:
                    j = n
                yield ('hex', d[i+1:j])
                i = j + 1
                continue
            if c == ord('['):
                yield ('arr_open', None)
                i += 1
                continue
            if c == ord(']'):
                yield ('arr_close', None)
                i += 1
                continue
            if c == ord('/'):
                j = i + 1
                while j < n and d[j] not in WS and d[j] not in b'()<>[]{}/%':
                    j += 1
                yield ('name', d[i+1:j].decode('latin-1'))
                i = j
                continue
            if c in b'+-.0123456789':
                j = i + 1
                while j < n and d[j] in b'+-.0123456789eE':
                    j += 1
                try:
                    yield ('num', float(d[i:j]))
                except ValueError:
                    pass
                i = j
                continue
            j = i
            while j < n and d[j] not in WS and d[j] not in b'()<>[]{}/%':
                j += 1
            yield ('op', d[i:j].decode('latin-1'))
            i = j if j > i else i + 1


def decode_codes(byts, font):
    """byte values -> [(code, unicode_str)] per glyph."""
    if font is None:
        font = Font(1, None, None, 0, 500.0, None)
    out = []
    if font.cb == 2:
        for k in range(0, len(byts) - 1, 2):
            code = (byts[k] << 8) | byts[k+1]
            if font.cmap and code in font.cmap:
                out.append((code, font.cmap[code]))
            else:
                out.append((code, chr(code) if code else ''))
        return out
    for v in byts:
        if font.cmap and v in font.cmap:
            out.append((v, font.cmap[v]))
        else:
            out.append((v, chr(v)))
    return out


def mat_mul(m1, m2):
    """Affine compose: apply m1 first, then m2."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return [a1*a2 + b1*c2, a1*b2 + b1*d2,
            c1*a2 + d1*c2, c1*b2 + d1*d2,
            e1*a2 + f1*c2 + e2, e1*b2 + f1*d2 + f2]


def mat_point(m, x, y):
    return (m[0]*x + m[2]*y + m[4], m[1]*x + m[3]*y + m[5])


def run_content(data, res_dict, objs, state, ctm=None, depth=0):
    """Interpret one content stream; recurses into Form XObjects (Do).
    Tracks the full text matrix + glyph advance widths so line assembly
    (TextState) can make MuPDF-style geometric decisions."""
    if depth > 8:
        return
    if ctm is None:
        ctm = [1, 0, 0, 1, 0, 0]
    fonts = font_decoders(res_dict, objs)
    xdict = nested_dict_slice(res_dict, '/XObject')
    xobjs = {m.group(1): int(m.group(2))
             for m in re.finditer(r'/([\w.]+)\s+(\d+)\s+\d+\s+R', xdict)}
    cur_font = None
    font_size = 1.0
    char_sp = 0.0   # Tc
    word_sp = 0.0   # Tw
    hscale = 1.0    # Tz/100
    leading = 0.0   # TL
    last_name = None
    nums = []
    tm = None       # text matrix (advances accumulate into e,f)
    tlm = None      # text line matrix
    gstack = []     # q/Q: saved ctm

    def set_line(tx, ty):
        nonlocal tm, tlm
        if tlm is None:
            tlm = [1, 0, 0, 1, 0, 0]
        tlm = mat_mul([1, 0, 0, 1, tx, ty], tlm)
        tm = list(tlm)

    def show(byts):
        nonlocal tm
        if tm is None:
            tm = [1, 0, 0, 1, 0, 0]
        f = fonts.get(cur_font)
        glyphs = decode_codes(byts, f)
        if not glyphs:
            return
        fw = f if f is not None else Font(1, None, None, 0, 500.0, None)
        # per-glyph emission (MuPDF decides line membership per char):
        # a glyph's visual extent is its FONT advance; Tc/Tw/kerns move
        # the pen only, so they surface as inter-glyph gaps
        for code, u in glyphs:
            m = mat_mul(tm, ctm)
            xscale = (m[0] * m[0] + m[1] * m[1]) ** 0.5 or 1.0
            direction = (m[0] / xscale, m[1] / xscale)
            size = abs(font_size) * ((m[2] * m[2] + m[3] * m[3]) ** 0.5)
            origin = (m[4], m[5])
            gw = fw.width(code) / 1000.0 * font_size * hscale
            vis_end = (origin[0] + direction[0] * gw * xscale,
                       origin[1] + direction[1] * gw * xscale)
            if u:
                state.show(u, origin, vis_end, direction, size)
            pen = gw + (char_sp +
                        (word_sp if (fw.cb == 1 and code == 32) else 0.0)
                        ) * hscale
            tm = mat_mul([1, 0, 0, 1, pen, 0], tm)

    def to_bytes(t, v):
        if t == 'str':
            return decode_literal(v)
        h = re.sub(rb'\s', b'', v).decode('ascii', 'replace')
        if len(h) % 2:
            h += '0'
        return [int(h[k:k+2], 16) for k in range(0, len(h), 2)]

    in_array = False
    arr_items = []  # ('s', bytes) | ('n', float) inside a TJ array
    for tok in Lexer(data).tokens():
        t, v = tok
        if t == 'num':
            if in_array:
                arr_items.append(('n', v))
            else:
                nums.append(v)
        elif t == 'name':
            last_name = v
            nums = []
        elif t == 'arr_open':
            in_array = True
            arr_items = []
        elif t == 'arr_close':
            in_array = False
        elif t in ('str', 'hex'):
            if in_array:
                arr_items.append(('s', to_bytes(t, v)))
            else:
                arr_items = [('s', to_bytes(t, v))]
        elif t == 'op':
            op = v
            if op == 'Tf':
                cur_font = last_name
                if nums:
                    font_size = nums[-1]
            elif op == 'Tc' and nums:
                char_sp = nums[-1]
            elif op == 'Tw' and nums:
                word_sp = nums[-1]
            elif op == 'Tz' and nums:
                hscale = nums[-1] / 100.0
            elif op == 'TL' and nums:
                leading = nums[-1]
            elif op == 'Tm' and len(nums) >= 6:
                tm = list(nums[-6:])
                tlm = list(tm)
            elif op in ('Td', 'TD') and len(nums) >= 2:
                tx, ty = nums[-2:]
                if op == 'TD':
                    leading = -ty
                set_line(tx, ty)
            elif op == 'T*':
                set_line(0, -leading)
            elif op == 'BT':
                tm = [1, 0, 0, 1, 0, 0]
                tlm = list(tm)
            elif op == 'ET':
                pass  # geometry decides line breaks, not BT/ET
            elif op in ('Tj', 'TJ', "'", '"'):
                if op == "'":
                    set_line(0, -leading)
                elif op == '"':
                    if len(nums) >= 2:
                        word_sp, char_sp = nums[-2], nums[-1]
                    set_line(0, -leading)
                for kind, item in arr_items:
                    if kind == 's':
                        show(item)
                    else:
                        if tm is not None:
                            tx = -item / 1000.0 * font_size * hscale
                            tm = mat_mul([1, 0, 0, 1, tx, 0], tm)
                arr_items = []
            elif op == 'q':
                gstack.append(list(ctm))
            elif op == 'Q':
                if gstack:
                    ctm = gstack.pop()
            elif op == 'cm' and len(nums) >= 6:
                ctm = mat_mul(nums[-6:], ctm)
            elif op == 'Do' and last_name in xobjs:
                ref = xobjs[last_name]
                if ref in objs:
                    xd, xs = objs[ref]
                    if xs is not None and '/Form' in xd:
                        data2 = inflate(xs) if '/FlateDecode' in xd else xs
                        xres = resources_of(xd, objs)
                        fm = re.search(r'/Matrix\s*\[\s*([-\d.\s]+)\]', xd)
                        fctm = ctm
                        if fm:
                            try:
                                mv = [float(x) for x in fm.group(1).split()]
                                if len(mv) == 6:
                                    fctm = mat_mul(mv, ctm)
                            except ValueError:
                                pass
                        run_content(data2, xres, objs, state, fctm,
                                    depth + 1)
            nums = []


def page_text(pnum, objs):
    dic = objs[pnum][0]
    state = TextState()
    res = resources_of(dic, objs)
    parts = dict_ref_array(dic, '/Contents')
    data = b''
    for p in parts:
        if p in objs and objs[p][1] is not None:
            d2, s2 = objs[p]
            data += (inflate(s2) if '/FlateDecode' in d2 else s2) + b'\n'
    run_content(data, res, objs, state)
    return state.finish()


def extract(path):
    b = open(path, 'rb').read()
    objs = expand_objstm(scan_objects(b))
    return [page_text(p, objs) for p in page_order(objs)]


if __name__ == '__main__':
    pages = extract(sys.argv[1])
    which = [int(x) for x in sys.argv[2:]] or range(len(pages))
    for i in which:
        print(f'===== page {i} =====')
        print(pages[i])


# Standard Macintosh glyph order (TrueType 'post' table spec), indexes
# 3..257 — subset fonts name /Differences glyphs gNN by original GID and
# the core Monotype fonts follow this order.
MAC_GLYPH_ORDER = (
    'space exclam quotedbl numbersign dollar percent ampersand '
    'quotesingle parenleft parenright asterisk plus comma hyphen period '
    'slash zero one two three four five six seven eight nine colon '
    'semicolon less equal greater question at A B C D E F G H I J K L M '
    'N O P Q R S T U V W X Y Z bracketleft backslash bracketright '
    'asciicircum underscore grave a b c d e f g h i j k l m n o p q r s '
    't u v w x y z braceleft bar braceright asciitilde Adieresis Aring '
    'Ccedilla Eacute Ntilde Odieresis Udieresis aacute agrave '
    'acircumflex adieresis atilde aring ccedilla eacute egrave '
    'ecircumflex edieresis iacute igrave icircumflex idieresis ntilde '
    'oacute ograve ocircumflex odieresis otilde uacute ugrave '
    'ucircumflex udieresis dagger degree cent sterling section bullet '
    'paragraph germandbls registered copyright trademark acute dieresis '
    'notequal AE Oslash infinity plusminus lessequal greaterequal yen '
    'mu partialdiff summation product pi integral ordfeminine '
    'ordmasculine Omega ae oslash questiondown exclamdown logicalnot '
    'radical florin approxequal Delta guillemotleft guillemotright '
    'ellipsis Agrave Atilde Otilde OE oe endash emdash '
    'quotedblleft quotedblright quoteleft quoteright divide lozenge '
    'ydieresis Ydieresis fraction currency guilsinglleft guilsinglright '
    'fi fl daggerdbl periodcentered quotesinglbase quotedblbase '
    'perthousand Acircumflex Ecircumflex Aacute Edieresis Egrave Iacute '
    'Icircumflex Idieresis Igrave Oacute Ocircumflex apple Ograve Uacute '
    'Ucircumflex Ugrave dotlessi circumflex tilde macron breve dotaccent '
    'ring cedilla hungarumlaut ogonek caron').split()

EXTRA_AGL = {
    'nonbreakingspace': '\u00a0', 'dagger': '\u2020', 'cent': '\u00a2',
    'sterling': '\u00a3', 'paragraph': '\u00b6',
    'germandbls': '\u00df', 'acute': '\u00b4', 'dieresis': '\u00a8',
    'notequal': '\u2260', 'AE': '\u00c6', 'Oslash': '\u00d8',
    'infinity': '\u221e', 'plusminus': '\u00b1',
    'lessequal': '\u2264', 'greaterequal': '\u2265', 'yen': '\u00a5',
    'partialdiff': '\u2202', 'summation': '\u2211',
    'product': '\u220f', 'integral': '\u222b', 'Omega': '\u03a9',
    'ae': '\u00e6', 'oslash': '\u00f8', 'questiondown': '\u00bf',
    'exclamdown': '\u00a1', 'logicalnot': '\u00ac',
    'radical': '\u221a', 'florin': '\u0192', 'approxequal': '\u2248',
    'guillemotleft': '\u00ab', 'guillemotright': '\u00bb',
    'OE': '\u0152', 'oe': '\u0153', 'lozenge': '\u25ca',
    'ydieresis': '\u00ff', 'Ydieresis': '\u0178',
    'fraction': '\u2044', 'currency': '\u00a4',
    'guilsinglleft': '\u2039', 'guilsinglright': '\u203a',
    'fi': 'fi', 'fl': 'fl', 'daggerdbl': '\u2021',
    'quotesinglbase': '\u201a', 'quotedblbase': '\u201e',
    'perthousand': '\u2030', 'Edieresis': '\u00cb',
    'Egrave': '\u00c8', 'Icircumflex': '\u00ce',
    'Idieresis': '\u00cf', 'Igrave': '\u00cc', 'apple': '',
    'Ograve': '\u00d2', 'Ucircumflex': '\u00db', 'Ugrave': '\u00d9',
    'dotlessi': '\u0131', 'circumflex': '\u02c6', 'tilde': '\u02dc',
    'macron': '\u00af', 'breve': '\u02d8', 'dotaccent': '\u02d9',
    'ring': '\u02da', 'hungarumlaut': '\u02dd', 'ogonek': '\u02db',
    'caron': '\u02c7', 'Aring': '\u00c5', 'Ntilde': '\u00d1',
    'Odieresis': '\u00d6', 'Udieresis': '\u00c4'.replace('\u00c4','\u00dc'),
    'Adieresis': '\u00c4', 'aring': '\u00e5',
    'egrave': '\u00e8', 'edieresis': '\u00eb', 'igrave': '\u00ec',
    'icircumflex': '\u00ee', 'idieresis': '\u00ef',
    'ograve': '\u00f2', 'quoteleft': '\u2018', 'quoteright': '\u2019',
}

def gid_to_unicode(gid, agl):
    i = gid - 3
    if 0 <= i < len(MAC_GLYPH_ORDER):
        nm = MAC_GLYPH_ORDER[i]
        if nm in agl: return agl[nm]
        if nm in EXTRA_AGL: return EXTRA_AGL[nm]
        if len(nm) == 1: return nm
    return None
