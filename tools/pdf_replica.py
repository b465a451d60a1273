#!/usr/bin/env python3
"""Dev-only replica of the reference's D2 no-images JSON pipeline
(enem_pdf_extractor.py:825-938) running over pdf_proto's page texts —
used to diff the decode against the committed golden
pdf_content_to_files/2023_D2_/2023_math_questions.json before porting
the decoder to Scala. NOT part of the engine."""
import json, re, sys
sys.path.insert(0, 'tools')
sys.path.insert(0, '.')
from pdf_proto import (scan_objects, expand_objstm, page_order, page_text,
                       resources_of, nested_dict_slice, dict_ref, inflate)

Q = 'QUESTÃO'


def load(path):
    b = open(path, 'rb').read()
    objs = expand_objstm(scan_objects(b))
    return objs, page_order(objs)


def page_has_images(pnum, objs, depth=0):
    dic = objs[pnum][0]
    return res_has_images(resources_of(dic, objs), objs, 0)


def res_has_images(res, objs, depth):
    if depth > 4:
        return False
    xdict = nested_dict_slice(res, '/XObject')
    for m in re.finditer(r'/([\w.]+)\s+(\d+)\s+\d+\s+R', xdict):
        ref = int(m.group(2))
        if ref not in objs:
            continue
        d = objs[ref][0]
        if '/Image' in d:
            return True
        if '/Form' in d:
            if res_has_images(resources_of(d, objs), objs, depth + 1):
                return True
    return False


def parse_alternatives(q):
    pattern = r'([A-E])\s*\n\1\s*'
    single = r'([A-E])\s{2}'
    q2, n = re.subn(pattern, lambda m: m.group(1) + ')', q)
    if n < 5:
        q2, n2 = re.subn(single, lambda m: m.group(1) + ')', q)
        if n2 < 5:
            return None
    matches = list(re.finditer(r'([A-E])\)', q2))
    for i, m in enumerate(matches):
        end = matches[i+1].start() if i + 1 < len(matches) else len(q2)
        if not q2[m.end():end]:
            return None
    alts = []
    pos = [m.start() for m in matches]
    for i in range(len(pos)):
        end = pos[i+1] if i + 1 < len(pos) else len(q2)
        alts.append(q2[pos[i]:end])
    return q2, alts


def find_answer(key_text, n):
    m = re.search(r'\b' + str(n) + r'\b', key_text)
    if not m:
        return 'não achou a questão'
    idx = m.start() + (3 if n < 100 else 4)
    return key_text[idx] if idx < len(key_text) else '?'


def main(pv, gb):
    objs, order = load(pv)
    kobjs, korder = load(gb)
    key_raw = page_text(korder[0], kobjs)
    key_text = re.sub(r'^.{4,}$', '', key_raw, flags=re.M)

    records = []
    total = 0
    for pi in range(1, len(order)):
        text = page_text(order[pi], objs)
        text = text.replace('Questão', Q)
        first = text.find(Q)
        if first < 0:
            continue
        text = text[first:]
        text = re.sub(r'\*\w{9}\*', '', text)
        text = re.sub(r'\*\w{10}\*', '', text)
        page_first = total + 1
        ntok = text.count(Q)
        total += ntok
        if page_has_images(order[pi], objs):
            continue
        text += ' ' + Q
        positions = [m.start() for m in re.finditer(re.escape(Q), text)]
        start = 0
        num = page_first
        for pos in positions:
            if pos == 0:
                continue
            ans = find_answer(key_text, num + 90)
            parsed = parse_alternatives(text[start:pos])
            if parsed is None:
                start = pos
                num += 1
                continue
            q2, alts = parsed
            disp = num + 90
            if 46 <= num <= 91:
                records.append({
                    'question_text': q2, 'correct_answer': ans,
                    'alternatives': alts, 'ID': f'2023_D2_N{disp}',
                    'year': 2023, 'day': 'D2', 'question_num': disp})
            start = pos
            num += 1
    return records


if __name__ == '__main__':
    recs = main('/root/reference/pdfs_enem/2023/2023_PV_impresso_D2_CD7.pdf',
                '/root/reference/pdfs_enem/2023/2023_GB_impresso_D2_CD7.pdf')
    golden = json.load(open(
        '/root/reference/pdf_content_to_files/2023_D2_/2023_math_questions.json'))
    print(f'mine: {len(recs)} records, golden: {len(golden)}')
    gm = {r['question_num']: r for r in golden}
    mm = {r['question_num']: r for r in recs}
    print('missing:', sorted(set(gm) - set(mm)))
    print('extra:', sorted(set(mm) - set(gm)))
    exact = 0
    for n in sorted(set(gm) & set(mm)):
        a, b = gm[n], mm[n]
        if a == b:
            exact += 1
            continue
        for k in a:
            if a[k] != b.get(k):
                print(f'Q{n} field {k} differs')
                if k == 'question_text' and '-v' in sys.argv:
                    import difflib
                    for line in difflib.unified_diff(
                            a[k].splitlines(), b[k].splitlines(),
                            'golden', 'mine', lineterm=''):
                        print('   ', line)
    print(f'exact-match records: {exact}/{len(golden)}')
