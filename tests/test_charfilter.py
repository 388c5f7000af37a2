"""Char filter goldens transcoded from the reference test suite.

Sources: ``analysis/common/src/test/.../charfilter/TestHTMLStripCharFilter
.java`` and ``TestMappingCharFilter.java``. Every expected string below is
the reference test's gold output (or, for the index-assertion tests like
testReserved, the full output string those assertions pin).
"""

import pytest

from lucene_spark.functions.charfilter import (
    HTML_ENTITIES,
    compile_char_filters,
    compile_mapping,
    html_strip,
)


# --- TestHTMLStripCharFilter.test() ---------------------------------------
def test_basic():
    html = ('<div class="foo">this is some text</div> here is a '
            '<a href="#bar">link</a> and another '
            '<a href="http://lucene.apache.org/">link</a>. '
            'This is an entity: &amp; plus a &lt;.  Here is an &. '
            '<!-- is a comment -->')
    gold = ("\nthis is some text\n here is a link and another link. "
            "This is an entity: & plus a <.  Here is an &. ")
    assert html_strip(html) == gold


# --- testGamma / testEntities / testMoreEntities --------------------------
def test_gamma():
    assert html_strip("&Gamma;", {"reserved"}) == "Γ"


def test_entities():
    test = "&nbsp; &lt;foo&gt; &Uuml;bermensch &#61; &Gamma; bar &#x393;"
    gold = "  <foo> Übermensch = Γ bar Γ"
    assert html_strip(test, {"reserved"}) == gold


def test_more_entities():
    test = "&nbsp; &lt;junk/&gt; &nbsp; &#33; &#64; and &#8217;"
    gold = "  <junk/>   ! @ and ’"
    assert html_strip(test, {"reserved"}) == gold


def test_uppercase_character_entity_variants():
    test = " &QUOT;-&COPY;&GT;>&LT;<&REG;&AMP;"
    gold = ' "-©>><<®&'
    assert html_strip(test) == gold


def test_unknown_entity_and_missing_semicolon():
    assert html_strip("&bogus; &amp") == "&bogus; &amp"
    assert html_strip("&#97x;") == "&#97x;"
    # out-of-range numeric refs are emitted verbatim
    assert html_strip("&#1114112;") == "&#1114112;"
    assert html_strip("&#x110000;") == "&#x110000;"
    # lone surrogate -> U+FFFD; valid pair -> combined code point
    assert html_strip("&#55296;") == "�"
    assert html_strip("&#55297;&#56320;") == "\U00010400"
    assert html_strip("&#x10400;") == "\U00010400"


# --- testReserved (converted from its indexOf assertions) ------------------
def test_reserved():
    test = ('aaa bbb <reserved ccc="ddddd"> eeee </reserved> ffff '
            '<reserved ggg="hhhh"/> <other/>')
    out = html_strip(test, {"reserved"})
    assert out.index("reserved") == 9
    assert out.index("reserved", 15) == 38
    assert out.index("reserved", 41) == 54
    assert "other" not in out


# --- testComment ------------------------------------------------------------
def test_comment():
    assert html_strip("<!--- three dashes, still a valid comment ---> ") == " "
    assert html_strip("<! -- blah > ") == " "  # not a comment: declaration
    assert html_strip("<!--" + "a " * 300) == ""  # unterminated comment


# --- testBR / testCloseBR / testEscapeBR -----------------------------------
def test_br():
    assert html_strip("one<BR />two<br>three") == "one\ntwo\nthree"
    assert html_strip("one<BR some stuff here too>two</BR>") == "one\ntwo\n"
    assert html_strip(" Secretary)</br> [[M") == " Secretary)\n [[M"


def test_escape_br():
    test = "one<BR class='whatever'>two</\nBR\n>"
    assert html_strip(test, {"BR"}) == test


# --- testServerSideIncludes -------------------------------------------------
def test_server_side_includes():
    test = ("one<img src=\"image.png\"\n"
            " alt =  \"Alt: <!--#echo var='${IMAGE_CAPTION:"
            "<!--comment-->\\'Comment\\'}'  -->\"\n\n"
            " title=\"Title: <!--#echo var=\"IMAGE_CAPTION\"-->\">two")
    assert html_strip(test) == "onetwo"

    test = ("one<script><!-- <!--#config comment=\"<!-- \\\"comment\\\"-->\""
            "--> --></script>two")
    assert html_strip(test) == "one\ntwo"


# --- testScriptQuotes / testEscapeScript ------------------------------------
def test_script_quotes():
    test = ("one<script attr= bare><!-- action('<!-- comment -->', "
            '"\\"-->\\""); --></script>two')
    assert html_strip(test) == "one\ntwo"

    test = "hello<script><!-- f('<!--internal--></script>'); --></script>"
    assert html_strip(test) == "hello\n"


def test_escape_script():
    test = "one<script no-value-attr>callSomeMethod();</script>two"
    gold = "one<script no-value-attr></script>two"
    assert html_strip(test, {"SCRIPT"}) == gold


# --- testStyle / testEscapeStyle --------------------------------------------
def test_style():
    test = ("one<style type=\"text/css\">\n"
            "<!--\n"
            "@import url('http://www.lasletrasdecanciones.com/css.css');\n"
            "-->\n"
            "</style>two")
    assert html_strip(test) == "one\ntwo"


def test_escape_style():
    test = ('one<style type="text/css"> body,font,a { font-family:arial; } '
            "</style>two")
    gold = 'one<style type="text/css"></style>two'
    assert html_strip(test, {"STYLE"}) == gold


# --- testInlineTagsNoSpace ---------------------------------------------------
def test_inline_tags_no_space():
    test = 'one<sPAn class="invisible">two<sup>2<sup>e</sup></sup>.</SpaN>three'
    assert html_strip(test) == "onetwo2e.three"


# --- testCDATA (the deterministic cases) -------------------------------------
@pytest.mark.parametrize("test,gold", [
    ("one<![CDATA[<one><two>three<four></four></two></one>]]>two",
     "one<one><two>three<four></four></two></one>two"),
    ("one<![CDATA[two<![CDATA[three]]]]><![CDATA[>four]]>five",
     "onetwo<![CDATA[three]]>fourfive"),
    ("<! [CDATA[&]]>", ""),
    ("<! [CDATA[&] ] >", ""),
    ("<! [CDATA[&]]", "<! [CDATA[&]]"),  # unclosed angle bang: verbatim
    ("<! [CDATA[&]]>", ""),
    ("<! [CDATA[&] ] >", ""),
    ("<! [CDATA[&] ] ", "<! [CDATA[&] ] "),
    ("<![CDATA[", ""),
    ("<![CDATA[<br>", "<br>"),
    ("<![CDATA[<br>]]", "<br>]]"),
    ("<![CDATA[<br>]]>", "<br>"),
    ("<![CDATA[<br>] ] >", "<br>] ] >"),
    ("<![CDATA[<br>] ] >", "<br>] ] >"),
    ("<! [CDATA[", "<! [CDATA["),
])
def test_cdata(test, gold):
    assert html_strip(test) == gold


def test_unclosed_angle_bang():
    assert html_strip("<![endif]") == "<![endif]"


# --- testMSWordMalformedProcessingInstruction --------------------------------
def test_msword_processing_instruction():
    test = ('one<?xml:namespace prefix = o ns = '
            '"urn:schemas-microsoft-com:office:office" />two')
    assert html_strip(test) == "onetwo"


def test_bare_question_tag_kept():
    # testBufferOverflow: "<?>" makes the filter *attempt* a PI but the
    # pattern requires [/?]> — output is unchanged.
    assert html_strip("ah<?> whatever") == "ah<?> whatever"
    assert html_strip("<?" + "a " * 600 + "?>") == ""


# --- testMalformedHTML (transcoded gold pairs) --------------------------------
@pytest.mark.parametrize("test,gold", [
    ("a <a hr<ef=aa<a>> </close</a>", "a <a hr<ef=aa> </close"),
    ('<a href=http://dmoz.org/cgi-bin/add.cgi?where=/arts/" class=lu '
     'style="font-size: 9px" target=dmoz>Submit a Site</a>',
     "Submit a Site"),
    ("<a href=javascript:ioSwitch('p8','http://www.csmonitor.com/') "
     "title=expand id=e8 class=expanded "
     "rel=http://www.csmonitor.com/>Christian Science",
     "Christian Science"),
    ('<link rel="alternate" type="application/rss+xml" title="San Francisco '
     '" 2008 RSS Feed" href="http://2008.sf.wordcamp.org/feed/" />', "\n"),
    ('<a href=" http://www.surgery4was.happyhost.org/video-of-arthroscopic-'
     'knee-surgery symptoms.html, heat congestive heart failure <a href=" '
     'http://www.symptoms1bad.happyhost.org/canine',
     '<a href=" http://www.surgery4was.happyhost.org/video-of-arthroscopic-'
     'knee-surgery symptoms.html, heat congestive heart failure <a href=" '
     'http://www.symptoms1bad.happyhost.org/canine'),
    ('<a href="http://ucblibraries.colorado.edu/how/index.htm"'
     'class="pageNavAreaText">', ""),
    ('<a href="#postcomment" title=""Leave a comment";">?', "?"),
    ("<a href='/modern-furniture'   ' id='21txt' class='offtab'   "
     "onMouseout=\"this.className='offtab';  return true;\" "
     "onMouseover=\"this.className='ontab';  return true;\">", ""),
    ("<a href='http://alievi.wordpress.com/category/01-todos-posts/' "
     "style='font-size: 275%; padding: 1px; margin: 1px;' "
     "title='01 - Todos Post's (83)'>", ""),
    ('The <a href=<a href="http://www.advancedmd.com>medical">'
     "http://www.advancedmd.com>medical</a> practice software</a>",
     'The <a href=medical">http://www.advancedmd.com>medical '
     "practice software"),
    ('<a href="node/21426" class="clipTitle2" title="Levi.com/BMX 2008 '
     'Clip of the Week 29 "Morgan Wade Leftover Clips"">'
     "Levi.com/BMX 2008 Clip of the Week 29...",
     "Levi.com/BMX 2008 Clip of the Week 29..."),
    ('<a href="printer_friendly.php?branch=&year=&submit=go&screen=";">'
     "Printer Friendly", "Printer Friendly"),
    ('<a href=#" ondragstart="return false" onclick="window.external.'
     "AddFavorite('http://www.amazingtextures.com', 'Amazing Textures');"
     'return false" onmouseover="window.status=\'Add to Favorites\';'
     'return true">Add to Favorites', "Add to Favorites"),
    ('E-mail: <a href=""mailto:XXXXXX@example.com" ">XXXXXX@example.com </a>',
     "E-mail: XXXXXX@example.com "),
    ('<li><a href="#28" title="Hubert "Geese" Ausby">Hubert "Geese" '
     "Ausby</a></li>", '\nHubert "Geese" Ausby\n'),
    ('<href="http://anbportal.com/mms/login.asp">', "\n"),
    ('<a href="', '<a href="'),
    ('<a href=">', ""),
    ('<a rel="nofollow" href="http://anissanina31.skyrock.com/'
     '1895039493-Hi-tout-le-monde.html" title=" Hi, tout le monde !>#</a>',
     "#"),
    ('<a href="video/addvideo&v=120838887181" onClick="return confirm('
     "'Are you sure you want  add this video to your profile? If it exists "
     "some video in your profile will be overlapped by this video!!')\" \" "
     "onmouseover=\"this.className='border2'\" "
     "onmouseout=\"this.className=''\">", ""),
    ("<a href=#Services & Support>", ""),
    ("<input type=\"image\" src=\"images/afbe.gif\" width=\"22\" "
     "height=\"22\"  hspace=\"4\" title=\"Add to Favorite\" "
     "alt=\"Add to Favorite\"onClick=\" if(window.sidebar){ "
     "window.sidebar.addPanel(document.title,location.href,''); }else "
     "if(window.external){ window.external.AddFavorite(location.href,"
     "document.title); }else if(window.opera&&window.print) { return true; "
     "}\">", ""),
    ('<area shape="rect" coords="12,153,115,305" href="http://'
     'statenislandtalk.com/v-web/gallery/Osmundsen-family"'
     "Art's Norwegian Roots in Rogaland\">", "\n"),
    ('<a rel="nofollow" href="http://arth26.skyrock.com/660188240-bonzai.'
     'html" title="bonza>#', "#"),
    ("<a href=  >", ""),
    ("<ahref=http:..", "<ahref=http:.."),
    ("<ahref=http:..>", "\n"),
    ('<ahref="http://aseigo.bddf.ca/cms/1025">A', "\nA"),
    ('<a href="/applications/defenseaerospace/19+rackmounts" title="19" '
     'Rackmounts">', ""),
    ("<a href=http://www.azimprimerie.fr/flash/backup/lewes-zip-code/"
     "savage-model-110-manual.html title=savage model 110 manual "
     "rel=dofollow>", ""),
    ('<a class="at" name="Lamborghini  href="http://lamborghini.'
     'coolbegin.com">Lamborghini /a>', "Lamborghini /a>"),
    ("<a href=/myspace !style='color:#993333'>", ""),
    ("<meta name=3DProgId content=3DExcel.Sheet>", "\n"),
    ('<link id=3D"shLink" href=3D"PSABrKelly-BADMINTONCupResults08FINAL'
     '2008_09_19=_files/sheet004.htm">', "\n"),
    ('<td bgcolor=3D"#FFFFFF" nowrap>', "\n"),
    ('<a href="http://basnect.info/usersearch/"predicciones-mundiales-2009"'
     '.html">"predicciones mundiales 2009"</a>',
     '"predicciones mundiales 2009"'),
    ('<a class="comment-link" href="https://www.blogger.com/comment.g?'
     'blogID=19402125&postID=114070605958684588"location.href=https://www.'
     'blogger.com/comment.g?blogID=19402125&postID=114070605958684588;>',
     ""),
    ('<a href = "/videos/Bishop"/" title = "click to see more Bishop" '
     'videos">Bishop"</a>', 'Bishop"'),
    ('<a href="http://bhaa.ie/calendar/event.php?eid=20081203150127531"">'
     "BHAA Eircom 2 &amp; 5 miles CC combined start</a>",
     "BHAA Eircom 2 & 5 miles CC combined start"),
    ('<a href="http://people.tribe.net/wolfmana" onClick=\'setClick'
     '("Application[tribe].Person[bb7df210-9dc0-478c-917f-436b896bcb79]")'
     "'\" title=\"Mana\">", ""),
    ("<a  href=\"http://blog.edu-cyberpg.com/ct.ashx?id=6143c528-080c-4bb2-"
     'b765-5ec56c8256d3&url=http%3a%2f%2fwww.gsa.ac.uk%2fmackintoshsketchbook'
     '%2f"" eudora="autourl">', ""),
    ('<input type="text" value="<search here>">',
     '<input type="text" value="\n">'),
    ('<input type="text" value="<search here">',
     '<input type="text" value="\n'),
    ('<input type="text" value="search here>">', '">'),
    ('<input type="text" value="&lt;search here&gt;" '
     "onFocus=\"this.value='<search here>'\">", ""),
    ("<![if ! IE]>\n<link href=\"http://i.deviantart.com/icons/favicon.png\" "
     'rel="shortcut icon"/>\n<![endif]>', "\n\n\n"),
    ("<![if supportMisalignedColumns]>\n<tr height=0 style='display:none'>"
     "\n<td width=64 style='width:48pt'></td>\n</tr>\n<![endif]>",
     "\n\n\n\n\n\n\n\n"),
])
def test_malformed_html(test, gold):
    assert html_strip(test) == gold


def test_entity_table_is_html4():
    # 253 HTML 4.0 entities + 6 uppercase variants
    assert len(HTML_ENTITIES) == 259
    assert HTML_ENTITIES["nbsp"] == " "  # reference overrides to plain space
    assert HTML_ENTITIES["apos"] == "'"
    assert HTML_ENTITIES["AMP"] == "&"


# --- MappingCharFilter (TestMappingCharFilter setup + testTokenStream) -------
_NORM = {
    "aa": "a", "bbb": "b", "cccc": "cc", "h": "i", "j": "jj", "k": "kkk",
    "ll": "llll", "empty": "", "\U0001D122": "fclef",
    "！": "full-width-exclamation",
}


def test_mapping_basic():
    f = compile_mapping(_NORM)
    assert f("x") == "x"
    assert f("h") == "i"
    assert f("j") == "jj"
    assert f("k") == "kkk"
    assert f("ll") == "llll"
    assert f("aa") == "a"
    assert f("bbb") == "b"
    assert f("cccc") == "cc"
    assert f("empty") == ""
    assert f("\U0001D122") == "fclef"
    assert f("！") == "full-width-exclamation"


def test_mapping_token_stream():
    f = compile_mapping(_NORM)
    assert f("h i j k ll cccc bbb aa") == "i i jj kkk llll cc b a"


def test_mapping_single_pass_no_rescan():
    # testChained: one pass maps aaaa -> aa (aa->a applied twice,
    # replacement text never rescanned); chaining twice gives a.
    f = compile_mapping(_NORM)
    assert f("aaaa ll h") == "aa llll i"
    assert f(f("aaaa ll h")) == "a llllllll i"


def test_mapping_longest_match():
    f = compile_mapping({"a": "x", "ab": "y", "abc": "z"})
    assert f("abca aab") == "zx xy"


def test_compile_char_filters_chain():
    chain = compile_char_filters((
        ("html_strip",),
        ("mapping", (("&", "and"),)),
    ))
    assert chain("<b>salt &amp; pepper</b>") == "salt and pepper"
    assert compile_char_filters(()) is None


def test_analyze_text_char_filters_wiring():
    from lucene_spark.functions.analysis import analyze_text
    terms, positions, length = analyze_text(
        "<div>Hello <b>World</b></div><script>junk()</script> &#120;y",
        char_filters=(("html_strip",),))
    assert list(terms) == ["hello", "world", "xy"]
    assert list(positions) == [0, 1, 2]
    assert length == 3


# --- HyphenatedWordsFilter (TestHyphenatedWordsFilter goldens) ---------------
def test_hyphenated_words():
    from lucene_spark.functions.analysis import analyze_text
    cf = (("hyphenated_words",),)
    inp = ("ecologi-\r\ncal devel-\r\n\r\nop compre-\thensive-hands-on "
           "and ecologi-\ncal")
    terms, _, _ = analyze_text(inp, tokenizer="whitespace",
                               char_filters=cf)
    assert terms == ["ecological", "develop", "comprehensive-hands-on",
                     "and", "ecological"]
    # testHyphenAtEnd: stream-final trailing hyphen survives
    terms, _, _ = analyze_text("devel-\r\n\r\nop ecology-",
                               tokenizer="whitespace", char_filters=cf)
    assert terms == ["develop", "ecology-"]
    # testOffsets token sequence
    terms, _, _ = analyze_text("abc- def geh 1234- 5678-",
                               tokenizer="whitespace", char_filters=cf)
    assert terms == ["abcdef", "geh", "12345678-"]
