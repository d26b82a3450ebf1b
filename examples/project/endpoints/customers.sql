SELECT
  c_custkey AS key,
  c_name AS name,
  c_acctbal AS balance,
  { 'segment': c_mktsegment, 'ids': {'nation': c_nationkey} } AS profile
FROM '{{{conn.path}}}'
WHERE 1=1
{{#params.id}}
  AND c_custkey = {{{ params.id }}}
{{/params.id}}
{{#params.segment}}
  AND c_mktsegment LIKE '%{{{ params.segment }}}%'
{{/params.segment}}
