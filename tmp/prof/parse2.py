import gzip, json, sys, collections
path = sys.argv[1]
with gzip.open(path, 'rt') as f:
    data = json.load(f)
events = [e for e in data.get('traceEvents', []) if e.get('ph') == 'X' and (e.get('args') or {}).get('hlo_category')]
# find while span
wh = [e for e in events if e['name'].startswith('while')]
if wh:
    w0 = wh[0]['ts']; w1 = wh[0]['ts'] + wh[0]['dur']
by_src = collections.Counter()
by_cat_in = collections.Counter()
tot = 0.0
for e in events:
    if e['name'].startswith('while'):
        continue
    if not (w0 <= e['ts'] <= w1):
        continue
    args = e['args']
    dur = e['dur']/1e3/3  # per iter ms
    src = args.get('source', '?')
    tf = args.get('tf_op', '')
    # short tf context: last two path components
    key = (src.replace('/root/repo/aicity_action_tpu/', ''), args['hlo_category'])
    by_src[key] += dur
    by_cat_in[args['hlo_category']] += dur
    tot += dur
print(f"per-iter device ms inside while: {tot:.2f}")
for cat, ms in by_cat_in.most_common():
    print(f"  {ms:7.2f} ms {cat}")
print("\nby source line (per-iter ms):")
for (src, cat), ms in by_src.most_common(35):
    print(f"{ms:7.2f} ms [{cat:22s}] {src}")
