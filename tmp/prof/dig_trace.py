import gzip, json, sys, collections
path = sys.argv[1]
with gzip.open(path, 'rt') as f:
    data = json.load(f)
events = data.get('traceEvents', [])
want = {'reshape.15504', 'copy.1471', 'reshape.1', 'copy', 'copy.1483', 'fusion.608', 'convolution_add_fusion.23', 'fusion.612', 'fusion.616', 'attn.323', 'attn.327', 'attn.321'}
seen = {}
for e in events:
    if e.get('ph') != 'X':
        continue
    name = e.get('name', '')
    if name in want and name not in seen:
        seen[name] = e.get('args', {})
for name, args in seen.items():
    print(f"== {name}")
    for k, v in args.items():
        print(f"   {k}: {str(v)[:300]}")
