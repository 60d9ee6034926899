"""Traditional→Simplified Chinese conversion (the ``cc_mode='t2s'``
option of the reference's TextNorm, cn_tn.py:1067,1078-1084, which
imports OpenCC at runtime — the package is absent in this container).

Char-level curated table: the t2s direction is the SAFE one at char
granularity (standard simplification maps many traditional forms onto
one simplified form; ambiguity lives almost entirely in the s2t
direction, which is why ``s2t`` stays gated below). OpenCC additionally
applies a phrase-level exception list (乾 in 乾隆 stays 乾, etc.);
those exceptions are rare proper-noun cases and are documented as out
of scope — the char map below covers the standard GB simplifications
for the high-frequency traditional inventory. The pipeline placement
matches the reference exactly: conversion runs FIRST, before banjiao/
fillers/erhua/NSW (cn_tn.py:1083-1084).
"""

from __future__ import annotations

# traditional → simplified, standard (one simplified target per entry)
T2S_PAIRS = (
    # pronouns / particles / function words
    "們们 這这 那那 個个 麼么 嗎吗 呢呢 吧吧 與与 為为 於于 從从 "
    "來来 去去 裡里 裏里 後后 時时 間间 會会 能能 還还 沒没 "
    # verbs of speech / cognition (言→讠 family)
    "說说 話话 語语 請请 謝谢 讓让 訴诉 記记 認认 識识 論论 評评 "
    "講讲 談谈 課课 試试 詞词 譯译 讀读 誰谁 調调 談谈 議议 訪访 "
    "計计 訓训 設设 許许 證证 詳详 誤误 諸诸 謀谋 誠诚 誕诞 諾诺 "
    "謎谜 謠谣 譜谱 警警 譽誉 讚赞 變变 讓让 "
    # metal (釒→钅)
    "錢钱 銀银 鐵铁 鋼钢 針针 釘钉 鈴铃 鉛铅 銅铜 鋁铝 鋒锋 錄录 "
    "錯错 鍵键 鎖锁 鏡镜 鐘钟 鑰钥 鑽钻 銳锐 鑄铸 錦锦 鍋锅 鏈链 "
    # food / eat (飠→饣)
    "飯饭 飲饮 餃饺 餅饼 館馆 餓饿 饅馒 饑饥 養养 "
    # silk (糸→纟)
    "紅红 約约 級级 紀纪 純纯 紙纸 紛纷 素素 索索 緊紧 紹绍 經经 "
    "給给 絡络 絕绝 統统 絲丝 綁绑 繼继 續续 維维 綠绿 網网 緒绪 "
    "線线 編编 緣缘 縣县 總总 績绩 繁繁 織织 繩绳 繪绘 纏缠 纖纤 "
    "緩缓 練练 組组 細细 終终 結结 "
    # horse / bird / fish / insect-adjacent
    "馬马 駕驾 騎骑 驚惊 驗验 騙骗 驅驱 駛驶 鳥鸟 雞鸡 鴨鸭 鵝鹅 "
    "鳴鸣 鷹鹰 鴉鸦 魚鱼 鮮鲜 鯨鲸 龍龙 龜龟 蟲虫 蝦虾 蟻蚁 蠅蝇 "
    "蠶蚕 "
    # vehicle / door / gate (車→车, 門→门)
    "車车 軍军 轉转 輪轮 輸输 較较 載载 輕轻 輝辉 轟轰 軌轨 "
    "門门 問问 間间 聞闻 閉闭 開开 關关 閱阅 闊阔 闖闯 閃闪 "
    # shell / money (貝→贝)
    "貝贝 買买 賣卖 貴贵 費费 資资 賞赏 賬账 質质 貨货 貧贫 貼贴 "
    "購购 貿贸 賀贺 賠赔 賢贤 負负 財财 責责 敗败 貯贮 賽赛 贏赢 "
    # page / head (頁→页)
    "頁页 頂顶 項项 順顺 須须 預预 領领 頭头 頻频 題题 額额 顏颜 "
    "願愿 類类 顧顾 顯显 頓顿 "
    # weather / nature
    "風风 雲云 電电 氣气 陽阳 陰阴 溫温 濕湿 熱热 燈灯 爐炉 燒烧 "
    "煙烟 燦灿 爛烂 "
    # places / common nouns
    "國国 園园 圓圆 圖图 團团 場场 塊块 壓压 壞坏 壩坝 墳坟 "
    "廠厂 廳厅 廣广 慶庆 應应 廟庙 廢废 "
    "東东 樂乐 書书 畫画 數数 樹树 橋桥 機机 條条 樣样 標标 構构 "
    "榮荣 槍枪 棄弃 權权 楊杨 極极 檢检 "
    # person / work / movement
    "動动 務务 勞劳 勢势 勸劝 辦办 協协 單单 "
    "業业 產产 億亿 萬万 與与 興兴 舉举 "
    "進进 運运 達达 過过 遠远 違违 連连 週周 遲迟 適适 選选 遺遗 "
    "還还 邊边 "
    # body / person
    "體体 頭头 臉脸 腳脚 膚肤 腦脑 臟脏 髮发 聲声 聽听 "
    # hand / action
    "擊击 擔担 據据 擇择 擴扩 攔拦 攝摄 掛挂 捨舍 撲扑 擁拥 攏拢 "
    "搶抢 撐撑 撥拨 "
    # perception / feeling
    "見见 覺觉 觀观 視视 規规 覽览 親亲 "
    "歡欢 歎叹 嘆叹 憶忆 懷怀 態态 慮虑 憐怜 懼惧 惱恼 悅悦 愛爱 "
    "憲宪 懲惩 "
    # study / culture
    "學学 師师 寫写 藝艺 術术 節节 華华 葉叶 藥药 蘭兰 蘇苏 蘋苹 "
    "薦荐 藍蓝 舊旧 勤勤 禮礼 祿禄 禍祸 福福 "
    # politics / society
    "黨党 員员 會会 議议 選选 戰战 勝胜 敵敌 態态 狀状 獨独 獲获 "
    "獎奖 猶犹 獄狱 "
    # misc very-high-frequency
    "發发 當当 對对 點点 時时 長长 張张 帳帐 幣币 師师 歸归 "
    "處处 備备 復复 徵征 徹彻 "
    "兩两 麗丽 嚴严 喪丧 並并 亂乱 亞亚 產产 畝亩 "
    "僅仅 傳传 傷伤 價价 儀仪 億亿 優优 償偿 儲储 僑侨 偉伟 傑杰 "
    "偽伪 係系 倉仓 們们 "
    "涼凉 淚泪 滅灭 滿满 濟济 漢汉 滬沪 濃浓 澤泽 濱滨 灣湾 淺浅 "
    "漸渐 潔洁 瀏浏 灑洒 濾滤 "
    "確确 礎础 礦矿 碼码 磚砖 "
    "種种 稱称 積积 穩稳 穫获 "
    "窮穷 竊窃 窯窑 "
    "筆笔 築筑 簡简 籃篮 籌筹 簽签 籠笼 篩筛 "
    "級级 縱纵 緯纬 "
    "罰罚 罵骂 羅罗 "
    "聯联 聰聪 職职 聖圣 "
    "膽胆 臨临 臺台 "
    "興兴 艱艰 "
    "補补 裝装 裏里 製制 複复 襯衬 褲裤 "
    "詩诗 誇夸 "
    "趕赶 趙赵 跡迹 踐践 躍跃 "
    "輩辈 辭辞 "
    "醫医 釋释 "
    "錶表 鍛锻 "
    "隊队 階阶 際际 險险 隱隐 隨随 "
    "難难 雜杂 離离 "
    "靈灵 靜静 "
    "韓韩 頑顽 "
    "飄飘 飾饰 "
    "駐驻 "
    "鬥斗 鬧闹 "
    "齊齐 齒齿 "
    "億亿 嚇吓 噸吨 嘔呕 嘗尝 嚮向 囑嘱 "
    "堅坚 壘垒 壯壮 壹壹 "
    "奮奋 奪夺 奧奥 "
    "婦妇 媽妈 嬸婶 嫗妪 "
    "孫孙 寶宝 實实 寬宽 審审 寢寝 對对 導导 "
    "屆届 屬属 層层 歲岁 "
    "島岛 峽峡 崗岗 嶺岭 "
    "幹干 併并 "
    "彎弯 彈弹 強强 歸归 "
    "徑径 "
    "憑凭 "
    "戲戏 戶户 "
    "無无 煩烦 "
    "爭争 爺爷 "
    "獻献 "
    "畢毕 異异 "
    "盡尽 監监 盤盘 盧卢 "
    "睜睁 瞞瞒 "
    "矯矫 "
    "秘秘 稅税 "
    "紮扎 "
    "義义 習习 聶聂 "
    "膠胶 "
    "艙舱 "
    "虛虚 號号 "
    "衛卫 "
    "訂订 計计 "
    "豐丰 "
    "賓宾 "
    "踴踊 "
    "輔辅 輯辑 "
    "遞递 遷迁 選选 "
    "鄉乡 鄰邻 鄭郑 "
    "釀酿 "
    "閏闰 閑闲 "
    "陝陕 陣阵 除除 隆隆 "
    "須须 "
    "顆颗 "
    "飽饱 餘余 "
    "鹽盐 鹼碱 "
    "默默 點点 "
    # completion sweep (common chars the family lists above missed)
    "兒儿 幾几 飛飞 歷历 曆历 陸陆 黃黄 麥麦 爾尔 衝冲 雖虽 隻只 "
    "響响 鬆松 獸兽 犧牺 塵尘 邏逻 訊讯 敘叙 濤涛 屢屡 壽寿 牠它 "
    "僕仆 淨净 爲为 啟启 啓启 夠够 祕秘 衆众 眾众 纔才 捲卷 嶽岳 "
    "檯台 颱台 鬚须 鹹咸 麵面 慣惯 "
    # high-frequency surnames / proper-name chars
    "陳陈 劉刘 吳吴 鄧邓 蔣蒋 蕭萧 馮冯 呂吕 譚谭 鄒邹 喬乔 賴赖 "
    "龔龚 範范 鍾钟 湯汤 鳳凤 "
    # second completion sweep
    "測测 側侧 廁厕 現现 環环 專专 準准 決决 況况 減减 損损 揮挥 "
    "沖冲 郵邮 鎮镇 銷销 軟软 輛辆 遊游 霧雾 齡龄 儘尽 冊册 髒脏 "
    "驟骤 鴻鸿 魯鲁 鵬鹏 龐庞 頸颈 頗颇 遙遥 錫锡 閣阁 醬酱 韻韵 "
    "湊凑 兌兑 顛颠 "
    "礙碍 惡恶 癒愈 驢驴 蘆芦 廬庐 蝕蚀 蝸蜗 蟬蝉 釣钓 銜衔 鋤锄 "
    "閥阀 閘闸 頒颁 頃顷 飼饲 駁驳 骯肮 鬢鬓 鱗鳞 鴿鸽 黴霉 闆板 "
)

T2S_MAP: dict[int, str] = {}
for _pair in T2S_PAIRS.split():
    _t, _s = _pair[0], _pair[1]
    if _t != _s:  # identity pairs above just document "no change"
        T2S_MAP[ord(_t)] = _s

_T2S_TRANSFORM = T2S_MAP  # str.translate-ready


def t2s(text: str) -> str:
    """Convert traditional chars to simplified (char-level standard
    table; see module docstring for the scoped-out OpenCC phrase
    exceptions)."""
    return text.translate(_T2S_TRANSFORM)


#: every char t2s can touch — consumed by the zh prefilter the same way
#: NSW_EXTRA_TRIGGER_CHARS is
T2S_TRIGGER_CHARS = frozenset(chr(c) for c in T2S_MAP)
