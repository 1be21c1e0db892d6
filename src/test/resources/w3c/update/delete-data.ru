PREFIX : <http://example/>
DELETE DATA { :b :p 2 . :zz :nope 99 . }
