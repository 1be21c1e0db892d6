PREFIX : <http://example/>
INSERT DATA {
  :c :p 3 .
  GRAPH <http://example/g1> { :s3 :in "added" }
}
