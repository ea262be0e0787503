#!/usr/bin/env python3
"""Emit crawlee_spark/data/public_suffix_list.dat — a snapshot of the
public-suffix list in the OFFICIAL publicsuffix.org file format.

The reference resolves registrable domains through tldts ``getDomain``
(packages/utils/src/internals/url.ts:26-58, basic-crawler.ts:1565), which
carries the full Mozilla public-suffix list. This snapshot bundles the
high-traffic subset of that public data (MPL-2.0 licensed list content,
authored here from the published registry structures) in the same grammar —
plain rules, ``*.`` wildcard rules, ``!`` exception rules, ICANN/PRIVATE
sections — so deployments can drop the complete current
https://publicsuffix.org/list/public_suffix_list.dat at the same path for
full coverage with zero code change.

Only rules with two or more labels (plus wildcard/exception rules) are
needed at runtime: the PSL algorithm's implicit default rule ``*`` already
makes every unlisted plain TLD its own public suffix.

Run: python tools/gen_psl_snapshot.py  (rewrites the .dat deterministically)
"""
from __future__ import annotations

import pathlib

OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "crawlee_spark"
    / "data"
    / "public_suffix_list.dat"
)

# --- ICANN section: second-level registration structures per ccTLD --------
# value = space-separated second-level labels registered under the key TLD
ICANN_SECOND_LEVEL = {
    "uk": "ac co gov ltd me net nhs org plc police sch",
    "au": "asn com edu gov id info net org act nsw nt qld sa tas vic wa",
    "nz": "ac co cri geek gen govt health iwi kiwi maori mil net org parliament school",
    "za": "ac co edu gov law mil net nom org school web",
    "jp": "ac ad co ed go gr lg ne or "
    # the 47 prefectures are plain .jp rules
    "aichi akita aomori chiba ehime fukui fukuoka fukushima gifu gunma "
    "hiroshima hokkaido hyogo ibaraki ishikawa iwate kagawa kagoshima "
    "kanagawa kochi kumamoto kyoto mie miyagi miyazaki nagano nagasaki "
    "nara niigata oita okayama okinawa osaka saga saitama shiga shimane "
    "shizuoka tochigi tokushima tokyo tottori toyama wakayama yamagata "
    "yamaguchi yamanashi",
    "br": "adv agr am art arq ato b bio blog bmd cim cng cnt com coop ecn eco "
    "edu emp eng esp etc eti far flog fm fnd fot fst g12 ggf gov imb ind inf "
    "jor jus leg lel mat med mil mp mus net nom not ntr odo org ppg pro psc "
    "psi qsl radio rec slg srv taxi teo tmp trd tur tv vet vlog wiki zlg",
    "cn": "ac com edu gov mil net org "
    "ah bj cq fj gd gs gx gz ha hb he hi hk hl hn jl js jx ln mo nm nx qh "
    "sc sd sh sn sx tj tw xj xz yn zj",
    "in": "ac co edu firm gen gov ind mil net nic org res",
    "mx": "com edu gob net org",
    "tr": "av bbs bel biz com dr edu gen gov info k12 kep mil name net org tel tv web",
    "ar": "com edu gob gov int mil musica net org tur",
    "kr": "ac co es go hs kg mil ms ne or pe re sc "
    "busan chungbuk chungnam daegu daejeon gangwon gwangju gyeongbuk "
    "gyeonggi gyeongnam incheon jeju jeonbuk jeonnam seoul ulsan",
    "il": "ac co gov idf k12 muni net org",
    "id": "ac biz co desa go mil my net or ponpes sch web",
    "my": "com edu gov mil name net org",
    "ph": "com edu gov i mil net ngo org",
    "sg": "com edu gov net org per",
    "th": "ac co go in mi net or",
    "tw": "club com ebiz edu game gov idv mil net org",
    "ua": "com edu gov in net org "
    "cherkassy chernigov chernovtsy ck cn cr crimea cv dn dnepropetrovsk "
    "donetsk dp if kh kharkov kherson khmelnitskiy kiev kirovograd km kr "
    "ks kv lg lugansk lutsk lviv mk nikolaev od odessa pl poltava rovno "
    "rv sumy te ternopil uzhgorod vinnica vn zaporizhzhe zhitomir zp zt",
    "vn": "ac biz com edu gov health info int name net org pro",
    "pl": "biz com edu gov info mil net org waw wroc krakow katowice lublin "
    "gda gdansk poznan lodz warszawa wroclaw szczecin bialystok olsztyn "
    "torun bydgoszcz rzeszow opole",
    "ru": "ac edu gov int mil test",
    "it": "edu gov "
    "abruzzo basilicata calabria campania emilia-romagna emiliaromagna "
    "friuli-venezia-giulia friuliveneziagiulia fvg lazio liguria lombardia "
    "lombardy marche molise piedmont piemonte puglia sardegna sardinia "
    "sicilia sicily toscana trentino-alto-adige trentinoaltoadige tuscany "
    "umbria valle-d-aosta valled-aosta vda veneto "
    "roma rome milano milan torino turin napoli naples bologna firenze "
    "florence genova genoa palermo venezia venice bari",
    "fr": "asso com gouv nom prd tm avocat medecin notaires pharmacien port greta",
    "us": None,  # expanded below (state structure)
    "ca": "ab bc gc mb nb nf nl ns nt nu on pe qc sk yt",
    "es": "com edu gob nom org",
    "pt": "com edu gov int net nome org publ",
    "ro": "arts com firm info nom nt org rec store tm www",
    "gr": "com edu gov net org",
    "hu": "2000 agrar bolt casino city co erotica erotika film forum games "
    "hotel info ingatlan jogasz konyvelo lakas media news org priv reklam "
    "sex shop sport suli szex tm tozsde utazas video",
    "at": "ac co gv or priv",
    "nl": "gov",
    "be": "ac",
    "no": "dep fhs folkebibl fylkesbibl herad idrett kommune mil museum priv stat vgs",
    "se": "a ac b bd brand c com d e f fh fhsk fhv g h i k komforb "
    "kommunalforbund komvux l lanbib m n naturbruksgymn o org p parti pp "
    "press r s t tm u w x y z",
    "fi": "aland",
    "dk": None,
    "ie": "gov",
    "cl": "co gob gov mil",
    "co": "arts com edu firm gov info int mil net nom org rec web",
    "pe": "com edu gob mil net nom org",
    "ve": "arts bib co com e12 edu firm gob gov info int mil net nom org rec store tec web",
    "uy": "com edu gub mil net org",
    "ec": "com edu fin gob gov info k12 med mil net org pro",
    "bo": "com edu gob int mil net org tv",
    "py": "com coop edu gov mil net org",
    "do": "art com edu gob gov mil net org sld web",
    "gt": "com edu gob ind mil net org",
    "cr": "ac co ed fi go or sa",
    "hk": "com edu gov idv net org",
    "mo": "com edu gov net org",
    "by": "com gov mil of",
    "kz": "com edu gov mil net org",
    "ge": "com edu gov mil net org pvt",
    "az": "biz com edu gov info int mil name net org pp pro",
    "lt": "gov",
    "lv": "asn com conf edu gov id mil net org",
    "ee": "aip com edu fie gov lib med org pri riik",
    "bg": "0 1 2 3 4 5 6 7 8 9 a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "rs": "ac co edu gov in org",
    "hr": "com from iz name",
    "ba": "com edu gov mil net org",
    "mk": "com edu gov inf name net org",
    "me": "ac co edu gov its net org priv",
    "am": "co com commune net org",
    "cy": "ac biz com ekloges gov ltd mil net org press pro tm",
    "mt": "com edu gov net org",
    "lb": "com edu gov net org",
    "jo": "com edu gov mil name net org sch",
    "kw": "com edu emb gov ind net org",
    "qa": "com edu gov mil name net org sch",
    "om": "co com edu gov med museum net org pro",
    "bh": "com edu gov net org",
    "iq": "com edu gov mil net org",
    "sy": "com edu gov mil net org",
    "af": "com edu gov net org",
    "lk": "ac assn com edu gov grp hotel int ltd net ngo org sch soc web",
    "mn": "edu gov org",
    "uz": "co com net org",
    "tj": "ac biz co com edu go gov int mil name net nic org test web",
    "kg": "com edu gov mil net org",
    "ma": "ac co gov net org press",
    "dz": "art asso com edu gov net org pol",
    "tn": "agrinet com defense edunet ens fin gov ind info intl mincom nat "
    "net org perso rnrt rns rnu tourism",
    "ly": "com edu gov id med net org plc sch",
    "sn": "art com edu gouv org perso univ",
    "ci": "ac asso co com ed edu go gouv int md net or org presse",
    "cm": "co com gov net",
    "et": "biz com edu gov info name net org",
    "mu": "ac co com gov net or org",
    "mg": "co com edu gov mil nom org prd tm",
    "rw": "ac co com edu gouv gov int mil net",
    "zm": "ac biz co com edu gov info mil net org sch",
    "mw": "ac biz co com coop edu gov int museum net org",
    "na": "ca cc co com dr in info mobi mx name or org pro school tv us ws",
    "bw": "co org",
    "ls": "co org",
    "sz": "ac co org",
    "ng": "com edu gov i mil mobi name net org sch",
    "ke": "ac co go info me mobi ne or sc",
    "gh": "com edu gov mil org",
    "tz": "ac co go hotel info me mil mobi ne or sc tv",
    "ug": "ac co com go ne or org sc",
    "zw": "ac co gov mil org",
    "eg": "com edu eun gov mil name net org sci",
    "sa": "com edu gov med net org pub sch",
    "ae": "ac co gov mil net org sch",
    "ir": "ac co gov id net org sch",
    "pk": "biz com edu fam gob gok gon gop gos gov net org web",
    "bn": "com edu gov net org",
    "kh": None,  # wildcard below
    "is": None,
    "cu": "com edu gov inf net org",
    "ht": "art asso com edu firm gouv info med net org perso pol pro rel shop",
    "pa": "abo ac com edu gob ing med net nom org sld",
    "sv": "com edu gob org red",
    "hn": "com edu gob mil net org",
    "ni": "ac biz co com edu gob in info int mil net nom org web",
    "pr": "ac biz com edu est gov info isla name net org pro prof",
    "tt": "biz co com edu gov info mil name net org pro",
    "vc": "com edu gov mil net org",
    "ag": "co com net nom org",
    "bs": "com edu gov net org",
    "bb": "biz co com edu gov info net org store tv",
    "bz": "com edu gov net org za",
    "gy": "co com edu gov net org",
    "sr": None,
    "fj": None,  # wildcard below
    "nc": "asso nom",
    "pf": "com edu org",
    "ws": "com edu gov net org",
    "to": "com edu gov mil net org",
    "tv": None,
    "vu": "com edu net org",
    "sb": "com edu gov net org",
    "nf": "arts com firm info net other per rec store web",
}

# Multi-label ICANN suffixes that do not fit the "second level under one
# TLD" shape (IDN second-levels, punycoded at runtime).
ICANN_EXTRA = [
    # 公司 / 网络 under .cn and .hk (punycode per RFC 3492 / IDNA)
    "xn--55qx5d.cn",  # 公司.cn
    "xn--io0a7i.cn",  # 网络.cn
    "xn--55qx5d.hk",  # 公司.hk
    "xn--od0alg.hk",  # 網絡.hk
]

# Wildcard rules (*.tld — EVERY second-level label is a public suffix) and
# their exception rules, per the published registry policies.
ICANN_WILDCARDS = [
    "bd",
    "ck",
    "er",
    "fj",
    "fk",
    "jm",
    "kh",
    "mm",
    "np",
    "pg",
    # Japanese designated-city geographic zones
    "kawasaki.jp",
    "kitakyushu.jp",
    "kobe.jp",
    "nagoya.jp",
    "sapporo.jp",
    "sendai.jp",
    "yokohama.jp",
]
ICANN_EXCEPTIONS = [
    "www.ck",
    "city.kawasaki.jp",
    "city.kitakyushu.jp",
    "city.kobe.jp",
    "city.nagoya.jp",
    "city.sapporo.jp",
    "city.sendai.jp",
    "city.yokohama.jp",
]

# US: the state structure — <st>.us plus k12/cc/lib zones under each state.
US_STATES = (
    "ak al ar az ca co ct dc de fl ga gu hi ia id il in ks ky la ma md me "
    "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa pr ri sc sd tn tx "
    "ut va vi vt wa wi wv wy"
).split()

# --- PRIVATE section: operator-run multi-tenant suffixes ------------------
PRIVATE = [
    # code/doc hosting
    "github.io",
    "githubusercontent.com",
    "gitlab.io",
    "bitbucket.io",
    "readthedocs.io",
    "neocities.org",
    # blogs / site builders
    "blogspot.com",
    "blogspot.co.uk",
    "blogspot.com.au",
    "blogspot.com.br",
    "blogspot.ca",
    "blogspot.de",
    "blogspot.fr",
    "blogspot.in",
    "blogspot.it",
    "blogspot.jp",
    "blogspot.mx",
    "blogspot.nl",
    "blogspot.se",
    "blogspot.sg",
    "wordpress.com",
    "weebly.com",
    "webflow.io",
    "myshopify.com",
    "hatenablog.com",
    "hatenadiary.jp",
    # app platforms
    "herokuapp.com",
    "herokussl.com",
    "appspot.com",
    "web.app",
    "firebaseapp.com",
    "cloudfunctions.net",
    "azurewebsites.net",
    "cloudapp.azure.com",
    "trafficmanager.net",
    "netlify.app",
    "vercel.app",
    "now.sh",
    "pages.dev",
    "workers.dev",
    "fly.dev",
    "onrender.com",
    "glitch.me",
    "repl.co",
    "surge.sh",
    "pythonanywhere.com",
    "eu.pythonanywhere.com",
    # AWS
    "s3.amazonaws.com",
    "elasticbeanstalk.com",
    "awsapprunner.com",
    "cloudfront.net",
    "*.compute.amazonaws.com",
    "*.compute-1.amazonaws.com",
    "*.elb.amazonaws.com",
    # dynamic DNS
    "duckdns.org",
    "dyndns.org",
    "no-ip.com",
    "no-ip.org",
    "ddns.net",
    "dynv6.net",
    "ngrok.io",
    # JP shared hosting
    "sakura.ne.jp",
]


def build() -> str:
    lines: list[str] = []
    add = lines.append
    add("// crawlee_spark bundled public-suffix snapshot (official PSL grammar).")
    add("// Drop the complete https://publicsuffix.org/list/public_suffix_list.dat")
    add("// at this path for full-registry coverage; the loader re-parses on import.")
    add("// Generated by tools/gen_psl_snapshot.py — edit THAT file, not this one.")
    add("")
    add("// ===BEGIN ICANN DOMAINS===")
    for tld in sorted(ICANN_SECOND_LEVEL):
        labels = ICANN_SECOND_LEVEL[tld]
        entries = sorted(set(labels.split())) if labels else []
        if tld == "us":
            entries = list(US_STATES)
        if not entries and tld not in ICANN_WILDCARDS:
            continue
        add(f"// {tld}")
        for lab in entries:
            add(f"{lab}.{tld}")
            if tld == "us":
                for zone in ("k12", "cc", "lib"):
                    add(f"{zone}.{lab}.us")
    add("// idn second-level registrations")
    for rule in ICANN_EXTRA:
        add(rule)
    add("// wildcard registries and their exceptions")
    for tld in ICANN_WILDCARDS:
        add(f"*.{tld}")
    for exc in ICANN_EXCEPTIONS:
        add(f"!{exc}")
    add("// ===END ICANN DOMAINS===")
    add("")
    add("// ===BEGIN PRIVATE DOMAINS===")
    for rule in PRIVATE:
        add(rule)
    add("// ===END PRIVATE DOMAINS===")
    add("")
    return "\n".join(lines)


if __name__ == "__main__":
    OUT.parent.mkdir(parents=True, exist_ok=True)
    text = build()
    OUT.write_text(text, encoding="utf-8")
    n_rules = sum(
        1 for ln in text.splitlines() if ln.strip() and not ln.startswith("//")
    )
    print(f"wrote {OUT} ({n_rules} rules)")
