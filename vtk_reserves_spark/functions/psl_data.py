"""Public-suffix-list snapshot (subset) for registered-domain lookup.

The PSL (publicsuffix.org — public data, maintained by Mozilla) is a
DATA FILE, not an algorithm: eTLD+1 ("registered domain") is defined
as the longest matching suffix rule plus one label, with ``*.parent``
wildcard rules and ``!host`` exception rules.  This module ships a
static snapshot SUBSET assembled from public knowledge (2024-era
list):

* every single-label TLD is covered by the PSL's implicit ``*`` rule
  (no data needed — registered domain = last two labels);
* the multi-label ICANN section entries for the registries that
  dominate web crawls (uk au jp nz br cn in kr tr ar za hk tw sg my
  id th ph vn mx il sa ae eg ng ke pk ua pl fr es pt gr ro hu at ca
  us co cl pe ve uy ec cr gt ...);
* the major PRIVATE-section hosting suffixes (github.io,
  blogspot.com, *.compute.amazonaws.com, ...) — exactly the entries
  that matter for per-domain quotas on crawl data, where a naive
  last-2-label rule would merge every github.io site into one
  "domain";
* the classic wildcard registries (*.ck with !www.ck, *.np, ...) and
  the Japanese city wildcards with their !city exceptions.

Entries NOT in the snapshot degrade exactly like the implicit rule
(last two labels) — same failure mode as an out-of-date PSL copy,
and the degradation is monotone: adding entries only splits buckets,
never merges them.

Reference parity: the reference has no URL handling at all; this
supports the crawl-curation surface (functions/urls.py).
"""

from __future__ import annotations

# --- ICANN section: exact multi-label rules (2 labels) ---------------
_ICANN_2 = """
co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk nhs.uk
police.uk mod.uk
com.au net.au org.au edu.au gov.au asn.au id.au
ac.jp ad.jp co.jp ed.jp go.jp gr.jp lg.jp ne.jp or.jp
aichi.jp akita.jp aomori.jp chiba.jp ehime.jp fukui.jp fukuoka.jp
fukushima.jp gifu.jp gunma.jp hiroshima.jp hokkaido.jp hyogo.jp
ibaraki.jp ishikawa.jp iwate.jp kagawa.jp kagoshima.jp kanagawa.jp
kochi.jp kumamoto.jp kyoto.jp mie.jp miyagi.jp miyazaki.jp nagano.jp
nagasaki.jp nara.jp niigata.jp oita.jp okayama.jp okinawa.jp osaka.jp
saga.jp saitama.jp shiga.jp shimane.jp shizuoka.jp tochigi.jp
tokushima.jp tokyo.jp tottori.jp toyama.jp wakayama.jp yamagata.jp
yamaguchi.jp yamanashi.jp
co.nz net.nz org.nz govt.nz ac.nz school.nz geek.nz gen.nz kiwi.nz
maori.nz mil.nz health.nz iwi.nz cri.nz parliament.nz
com.br net.br org.br gov.br edu.br mil.br art.br adv.br arq.br
bio.br blog.br eco.br emp.br eng.br esp.br etc.br eti.br far.br
fnd.br fot.br fst.br g12.br ggf.br imb.br ind.br inf.br jor.br
jus.br lel.br mat.br med.br mus.br not.br ntr.br odo.br
com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn
bj.cn sh.cn tj.cn cq.cn he.cn sx.cn nm.cn ln.cn jl.cn hl.cn js.cn
zj.cn ah.cn fj.cn jx.cn sd.cn ha.cn hb.cn hn.cn gd.cn gx.cn hi.cn
sc.cn gz.cn yn.cn xz.cn sn.cn gs.cn qh.cn nx.cn xj.cn tw.cn hk.cn
mo.cn
co.in net.in org.in firm.in gen.in ind.in nic.in ac.in edu.in
res.in gov.in mil.in
co.kr ne.kr or.kr re.kr pe.kr go.kr mil.kr ac.kr hs.kr ms.kr es.kr
sc.kr kg.kr seoul.kr busan.kr daegu.kr incheon.kr gwangju.kr
daejeon.kr ulsan.kr gyeonggi.kr gangwon.kr chungbuk.kr chungnam.kr
jeonbuk.kr jeonnam.kr gyeongbuk.kr gyeongnam.kr jeju.kr
com.tr net.tr org.tr gov.tr edu.tr biz.tr info.tr web.tr av.tr
bbs.tr bel.tr dr.tr gen.tr k12.tr name.tr pol.tr tel.tr tv.tr
com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar tur.ar musica.ar
co.za net.za org.za gov.za edu.za ac.za web.za nom.za mil.za law.za
com.hk net.hk org.hk gov.hk edu.hk idv.hk
com.tw net.tw org.tw gov.tw edu.tw idv.tw game.tw ebiz.tw club.tw
mil.tw
com.sg net.sg org.sg gov.sg edu.sg per.sg
com.my net.my org.my gov.my edu.my mil.my name.my
co.id net.id or.id web.id sch.id go.id ac.id mil.id biz.id my.id
desa.id ponpes.id
co.th ac.th go.th in.th mi.th net.th or.th
com.ph net.ph org.ph gov.ph edu.ph ngo.ph mil.ph i.ph
com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn info.vn
name.vn pro.vn health.vn
com.mx net.mx org.mx gob.mx edu.mx
co.il org.il net.il ac.il gov.il muni.il idf.il k12.il
com.sa net.sa org.sa gov.sa edu.sa med.sa pub.sa sch.sa
co.ae net.ae org.ae gov.ae ac.ae sch.ae mil.ae
com.eg net.eg org.eg gov.eg edu.eg eun.eg sci.eg mil.eg name.eg
com.ng net.ng org.ng gov.ng edu.ng name.ng sch.ng mil.ng mobi.ng
i.ng
co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke mobi.ke info.ke
com.pk net.pk org.pk edu.pk gov.pk fam.pk biz.pk web.pk gok.pk
gop.pk gos.pk
com.ua net.ua org.ua edu.ua gov.ua in.ua kiev.ua kyiv.ua lviv.ua
odessa.ua kharkov.ua
com.pl net.pl org.pl edu.pl gov.pl info.pl waw.pl wroc.pl krakow.pl
poznan.pl lodz.pl gda.pl gdansk.pl szczecin.pl lublin.pl
bialystok.pl olsztyn.pl torun.pl
asso.fr com.fr gouv.fr nom.fr prd.fr tm.fr avocat.fr aeroport.fr
com.es nom.es org.es gob.es edu.es
com.pt edu.pt gov.pt int.pt net.pt nome.pt org.pt publ.pt
com.gr edu.gr net.gr org.gr gov.gr
com.ro org.ro tm.ro nt.ro nom.ro info.ro rec.ro arts.ro firm.ro
store.ro www.ro
co.hu org.hu info.hu priv.hu tm.hu sport.hu
ac.at co.at gv.at or.at
ab.ca bc.ca mb.ca nb.ca nf.ca nl.ca ns.ca nt.ca nu.ca on.ca pe.ca
qc.ca sk.ca yk.ca gc.ca
al.us ak.us az.us ar.us ca.us co.us ct.us de.us dc.us fl.us ga.us
hi.us id.us il.us in.us ia.us ks.us ky.us la.us me.us md.us ma.us
mi.us mn.us ms.us mo.us mt.us ne.us nv.us nh.us nj.us nm.us ny.us
nc.us nd.us oh.us ok.us or.us pa.us ri.us sc.us sd.us tn.us tx.us
ut.us vt.us va.us wa.us wv.us wi.us wy.us fed.us isa.us nsn.us
dni.us kids.us
com.co net.co org.co edu.co gov.co nom.co mil.co arts.co firm.co
info.co int.co rec.co web.co
gob.cl gov.cl
com.pe net.pe org.pe gob.pe edu.pe mil.pe nom.pe
com.ve net.ve org.ve gob.ve edu.ve mil.ve web.ve co.ve info.ve
com.uy net.uy org.uy edu.uy gub.uy mil.uy
com.ec net.ec org.ec edu.ec gov.ec gob.ec fin.ec med.ec pro.ec
info.ec mil.ec k12.ec
co.cr ac.cr ed.cr fi.cr go.cr or.cr sa.cr
com.gt net.gt org.gt edu.gt gob.gt ind.gt mil.gt
gov.ie aland.fi ac.be
"""

# --- PRIVATE section: hosting platforms (exact, 2 labels) ------------
_PRIVATE_2 = """
github.io githubusercontent.com gitlab.io bitbucket.io
blogspot.com wordpress.com herokuapp.com appspot.com
firebaseapp.com web.app netlify.app vercel.app pages.dev
workers.dev azurewebsites.net cloudfront.net readthedocs.io
surge.sh now.sh glitch.me onrender.com fly.dev deno.dev
neocities.org weebly.com wixsite.com pythonanywhere.com
shinyapps.io repl.co
s3.amazonaws.com
blogspot.in blogspot.de blogspot.fr blogspot.jp blogspot.mx
"""

# --- PRIVATE section: 3-label exact rules -----------------------------
_PRIVATE_3 = """
blogspot.co.uk blogspot.com.au blogspot.com.br blogspot.co.nz
blogspot.co.za blogspot.com.ar blogspot.com.mx blogspot.co.il
blogspot.co.ke blogspot.com.tr
"""

# --- wildcard rules: "*.<parent>"; stored as the parent ---------------
#: parent has 1 label → any 2-label suffix under it is public
WILDCARD_PARENTS_1 = ("ck", "er", "np", "pg", "bd")
#: parent has 2 labels (the Japanese designated-city wildcards)
WILDCARD_PARENTS_2 = (
    "kobe.jp", "kawasaki.jp", "kitakyushu.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
)
#: parent has 3 labels (AWS per-VM hostnames)
WILDCARD_PARENTS_3 = (
    "compute.amazonaws.com", "compute-1.amazonaws.com",
    "elb.amazonaws.com",
)

# --- exception rules: "!<host>" — host is NOT a public suffix ---------
EXCEPTIONS_2 = ("www.ck",)
EXCEPTIONS_3 = (
    "city.kobe.jp", "city.kawasaki.jp", "city.kitakyushu.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
)


def _parse(block: str) -> tuple[str, ...]:
    out = []
    for tok in block.split():
        tok = tok.strip().lower()
        if tok and "?" not in tok:  # defensive: drop any malformed token
            out.append(tok)
    return tuple(dict.fromkeys(out))


#: exact public-suffix rules with exactly 2 labels
EXACT_2 = _parse(_ICANN_2) + tuple(
    s for s in _parse(_PRIVATE_2) if s.count(".") == 1
)
#: exact public-suffix rules with exactly 3 labels
EXACT_3 = tuple(
    s for s in _parse(_PRIVATE_2) if s.count(".") == 2
) + _parse(_PRIVATE_3)

assert all(s.count(".") == 1 for s in EXACT_2)
assert all(s.count(".") == 2 for s in EXACT_3)
